#!/usr/bin/env python3
"""Split render_image_pallas wall time into stages on the real TPU:
(a) raygen only, (b) raygen + trace, (c) full pipeline (+ unpermute/mean).

Usage: python tools/stage_split_probe.py [--scenes small medium large]
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
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.megakernel import trace_pallas
    from rays1bench_tpu.kernels.pipeline import (_tile_order, _keep_count,
                                                 render_image_pallas)
    from rays1bench_tpu.kernels import culling
    from rays1bench_tpu.scene import builders
    from rays1bench_tpu.scene.spheres import prepare

    cfg = RenderConfig(width=1280, height=720, spp=args.spp, max_bounces=10)

    @functools.partial(jax.jit, static_argnames=("cfg", "tile"))
    def raygen(salt, camera, cfg, tile):
        ids_np, x_np, y_np, _, _ = _tile_order(cfg.width, cfg.height,
                                               cfg.spp, tile)
        ray_id = jnp.asarray(ids_np)
        x = jnp.asarray(x_np).astype(jnp.float32)
        y = jnp.asarray(y_np).astype(jnp.float32)
        seed = jnp.uint32(cfg.seed)
        ju, jv = rng_mod.pixel_jitter(seed, ray_id)
        s = (x + ju) / cfg.width + salt
        t = (y + jv) / cfg.height
        rays = camera.generate_rays(s, t, seed, ray_id)
        return rays, ray_id

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "tile", "unroll", "n_real"))
    def raygen_trace(soa, camera, cfg, tile, unroll, n_real):
        valid = soa.radius != 0.0
        perm = culling.morton_order(soa.center_x, soa.center_y,
                                    soa.center_z, valid)
        keep = _keep_count(n_real, perm.shape[0], unroll)
        idx = perm[:keep]
        soa = _dc.replace(soa, **{
            f.name: jnp.take(getattr(soa, f.name), idx)
            for f in _dc.fields(soa)})
        spheres = prepare(soa)
        rays, ray_id = raygen(jnp.float32(0.0), camera, cfg, tile)
        (rr, rg, rb), n = trace_pallas(spheres, *rays, ray_id, cfg,
                                       tile_rays=tile, unroll=unroll)
        return rr, n

    import numpy as np

    def readback(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(jnp.asarray(leaves[0]).sum())

    def timeit(fn, scene):
        readback(fn(scene.spheres, 0.0))
        ts = []
        for i in range(args.runs):
            sph = _dc.replace(scene.spheres,
                              center_x=scene.spheres.center_x + (i + 1) * 1e-7)
            t0 = time.perf_counter()
            readback(fn(sph, (i + 1) * 1e-9))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name in args.scenes:
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        t_gen = timeit(lambda s, salt: raygen(jnp.float32(salt), camera,
                                              cfg, args.tile), scene)
        t_trace = timeit(lambda s, salt: raygen_trace(
            s, camera, cfg, args.tile, args.unroll, scene.n_real), scene)
        t_full = timeit(lambda s, salt: render_image_pallas(
            s, camera, cfg, tile_rays=args.tile, unroll=args.unroll,
            n_real=scene.n_real), scene)
        print(f"{name}: raygen={t_gen*1e3:.1f}ms raygen+trace={t_trace*1e3:.1f}ms "
              f"full={t_full*1e3:.1f}ms -> trace={((t_trace-t_gen))*1e3:.1f}ms "
              f"assemble={(t_full-t_trace)*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
