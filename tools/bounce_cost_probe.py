#!/usr/bin/env python3
"""Ablate the megakernel's per-bounce cost on the real TPU: time the full
kernel vs. a stub-scatter variant (mirror bounce, no RNG/normalize) to split
bounce time into intersection vs. scatter+overhead.

Usage: python tools/bounce_cost_probe.py [--scene medium] [--tile 2048]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_once(render, scene, cfg, n_real, runs=3):
    import dataclasses as _dc
    img, nrays = render(scene.spheres)
    float(img.sum())
    times = []
    for i in range(runs):
        sph = _dc.replace(scene.spheres,
                          center_x=scene.spheres.center_x + (i + 1) * 1e-7)
        t0 = time.perf_counter()
        img, nrays = render(sph)
        float(img.sum())
        times.append(time.perf_counter() - t0)
    return min(times), int(nrays)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=["small", "medium", "large"])
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels import megakernel as mk
    from rays1bench_tpu.kernels.pipeline import render_image_pallas, _render_jit
    from rays1bench_tpu.scene import builders

    cfg = RenderConfig(width=1280, height=720, spp=args.spp, max_bounces=10)

    def stub_scatter(dx, dy, dz, rec, seed, ray_id, bounce):
        # mirror reflect, no RNG, no normalize: isolates scatter+RNG cost
        d_dot_n = dx * rec.nx + dy * rec.ny + dz * rec.nz
        sx = dx - 2.0 * d_dot_n * rec.nx
        sy = dy - 2.0 * d_dot_n * rec.ny
        sz = dz - 2.0 * d_dot_n * rec.nz
        ok = rec.mat_type < 99
        return (sx, sy, sz), (rec.albedo_x, rec.albedo_y, rec.albedo_z), ok

    real = mk.scatter
    for name in args.scenes:
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        for tag, sc in (("full", real), ("stub-scatter", stub_scatter)):
            mk.scatter = sc
            _render_jit._clear_cache()
            mk.trace_pallas._clear_cache()
            render = lambda sph: render_image_pallas(
                sph, camera, cfg, tile_rays=args.tile, unroll=16,
                n_real=scene.n_real)
            best, nrays = run_once(render, scene, cfg, scene.n_real)
            print(f"{name} {tag}: {best*1e3:.1f}ms "
                  f"({nrays/best/1e6:.1f} mrays/s nominal)", flush=True)
    mk.scatter = real


if __name__ == "__main__":
    main()
