#!/usr/bin/env python3
"""Measure megakernel dead-lane waste: per-tile while-loop iterations x tile
size vs. live ray count (the mrays/s numerator). Ratio = upper bound on the
speedup available from ray compaction / finer early exit.

Usage: python tools/waste_probe.py [--scenes small medium large] [--tile 2048]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=["small", "medium", "large"])
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--unroll", type=int, default=16)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax.numpy as jnp
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.megakernel import trace_pallas
    from rays1bench_tpu.kernels.pipeline import _tile_order, _keep_count
    from rays1bench_tpu.kernels import culling
    from rays1bench_tpu.scene import builders
    from rays1bench_tpu.scene.spheres import prepare
    import dataclasses as _dc

    cfg = RenderConfig(width=1280, height=720, spp=args.spp, max_bounces=10)
    for name in args.scenes:
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        soa = scene.spheres
        valid = soa.radius != 0.0
        perm = culling.morton_order(soa.center_x, soa.center_y, soa.center_z,
                                    valid)
        keep = _keep_count(scene.n_real, perm.shape[0], args.unroll)
        idx = perm[:keep]
        soa = _dc.replace(soa, **{
            f.name: jnp.take(getattr(soa, f.name), idx)
            for f in _dc.fields(soa)})
        spheres = prepare(soa)

        ids_np, x_np, y_np, _, _ = _tile_order(cfg.width, cfg.height, cfg.spp,
                                               args.tile)
        ray_id = jnp.asarray(ids_np)
        x = jnp.asarray(x_np).astype(jnp.float32)
        y = jnp.asarray(y_np).astype(jnp.float32)
        seed = jnp.uint32(cfg.seed)
        ju, jv = rng_mod.pixel_jitter(seed, ray_id)
        s = (x + ju) / cfg.width
        t = (y + jv) / cfg.height
        ox, oy, oz, dx, dy, dz = camera.generate_rays(s, t, seed, ray_id)
        (rr, rg, rb), nrays, iters, depth = trace_pallas(
            spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
            tile_rays=args.tile, unroll=args.unroll, debug_iters=True)
        iters = np.asarray(iters)
        depth = np.asarray(depth)
        live = int(nrays)
        lane_work = int(iters.sum()) * args.tile
        np.savez(f"/tmp/depths_{name}.npz", depth=depth, ids=ids_np)
        print(f"{name}: spheres={keep} live_rays={live} "
              f"lane_work={lane_work} waste={lane_work/live:.2f}x "
              f"iters: mean={iters.mean():.2f} p50={np.percentile(iters,50):.0f} "
              f"p90={np.percentile(iters,90):.0f} max={iters.max()} "
              f"tiles={iters.size} -> /tmp/depths_{name}.npz", flush=True)


if __name__ == "__main__":
    main()
