#!/usr/bin/env python3
"""Time N perturbed frames inside ONE jit dispatch (lax.scan) to measure
sustained on-device throughput without the ~29 ms tunnel round-trip per call.

Usage: python tools/batched_frames_probe.py [--frames 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=["small", "medium", "large"])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.scene import builders

    cfg = RenderConfig(width=1280, height=720, spp=args.spp, max_bounces=10)

    @functools.partial(jax.jit, static_argnames=("n_real", "frames"))
    def bench_n(spheres, camera, salts, n_real, frames):
        def body(carry, salt):
            sph = _dc.replace(spheres, center_x=spheres.center_x + salt)
            img, nrays = render_image_pallas(sph, camera, cfg, n_real=n_real)
            s, r = carry
            return (s + img.sum(), r + nrays.astype(jnp.uint32)), 0
        (s, r), _ = jax.lax.scan(body, (jnp.float32(0), jnp.uint32(0)), salts)
        return s, r

    for name in args.scenes:
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        salts = jnp.arange(1, args.frames + 1, dtype=jnp.float32) * 1e-7
        s, r = bench_n(scene.spheres, camera, salts, scene.n_real, args.frames)
        float(s)
        times = []
        for i in range(args.runs):
            salts_i = salts + i * 1e-9
            t0 = time.perf_counter()
            s, r = bench_n(scene.spheres, camera, salts_i, scene.n_real,
                           args.frames)
            float(s)
            times.append(time.perf_counter() - t0)
        best = min(times)
        rays = int(r)
        print(f"{name} frames={args.frames}: total={best*1e3:.1f}ms "
              f"per_frame={best/args.frames*1e3:.2f}ms "
              f"-> {rays/best/1e6:.1f} mrays/s "
              f"times={[round(t*1e3,1) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
