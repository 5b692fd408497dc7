#!/usr/bin/env python3
"""Headline benchmark entry point.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "mrays/s", "vs_baseline": N}

Metric: mrays/s on the large scene (1280x720 @ 4 spp, max 10 bounces,
BASELINE.json headline config), rays counted per radiance evaluation incl.
bounces — the reference's own metric (src/latest/rayweek1.cpp:517,
src/common/common.h:41-44). vs_baseline compares against the reference's best
published number, step13 multithreaded large = 59.362 mrays/s on an i9 9900K
(README.md:52).

Usage: python bench.py [--runs N] [--scene large] [--spp 4] [--quick]
"""

import argparse
import json
import os
import sys
import time

BASELINE_MRAYS = 59.362  # reference step13 MT, large scene (README.md:52)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scene", default="large", choices=["small", "medium", "large"])
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=10)
    ap.add_argument("--quick", action="store_true", help="80x60 smoke config")
    ap.add_argument("--save", action="store_true", help="write out_<scene>.tga")
    args = ap.parse_args()

    import jax
    from rays1bench_tpu.core.cache import enable as enable_compile_cache
    enable_compile_cache()  # remote kernel compiles take minutes; cache them
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas as render_image
    from rays1bench_tpu.render.pipeline import to_srgb_u8
    from rays1bench_tpu.scene import builders, tga

    if args.quick:
        cfg = RenderConfig(width=80, height=60, spp=args.spp,
                           max_bounces=args.max_bounces)
    else:
        cfg = RenderConfig(width=1280, height=720, spp=args.spp,
                           max_bounces=args.max_bounces)

    scene = builders.SCENES[args.scene](cfg.aspect)
    camera = scene.camera.build()

    render_image_ = lambda sph, cam_, cfg_: render_image(
        sph, cam_, cfg_, n_real=scene.n_real)

    # Warmup (compile).
    img, num_rays = render_image_(scene.spheres, camera, cfg)
    float(img.sum())

    # Each timed run perturbs one scene leaf by a sub-ulp-of-the-image amount
    # and reads back a checksum: the remote runtime caches identical
    # executions, so identical repeated calls would time as ~0.
    import dataclasses as _dc
    times = []
    for i in range(args.runs):
        spheres = _dc.replace(scene.spheres,
                              center_x=scene.spheres.center_x + (i + 1) * 1e-7)
        t0 = time.perf_counter()
        img, num_rays = render_image_(spheres, camera, cfg)
        float(img.sum())
        times.append(time.perf_counter() - t0)

    best = min(times)
    rays = int(num_rays)
    mrays = rays / best / 1e6

    if args.save:
        import numpy as np
        tga.write_rgb24(f"out_{args.scene}.tga", np.asarray(to_srgb_u8(img)))

    print(json.dumps({
        "metric": f"mrays_per_sec_{args.scene}_{cfg.width}x{cfg.height}_{cfg.spp}spp",
        "value": round(mrays, 3),
        "unit": "mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))
    print(f"# rays={rays} best={best:.4f}s times={[round(t,4) for t in times]} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
