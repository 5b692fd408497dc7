#!/usr/bin/env python3
"""Measure per-grid-step fixed overhead: a pallas_call with the megakernel's
exact I/O shapes (7 VMEM ray inputs + SMEM sphere matrix + 4 outputs) but a
trivial body, over the same 1800-tile grid. Separates tile I/O + grid
overhead from bounce-loop compute.

Usage: python tools/tile_overhead_probe.py [--tiles 1800] [--tile-rays 2048]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=1800)
    ap.add_argument("--tile-rays", type=int, default=2048)
    ap.add_argument("--spheres", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    sub = args.tile_rays // LANES
    num_tiles = args.tiles
    shape2 = (num_tiles * sub, LANES)

    def body(sph_smem, a, b, c, d, e, f, g, o1, o2, o3, o4):
        o1[...] = a[...] + sph_smem[0, 0]
        o2[...] = b[...]
        o3[...] = c[...]
        o4[...] = (d[...] + e[...] + f[...] + g[...]).astype(jnp.int32)

    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32s = jax.ShapeDtypeStruct(shape2, jnp.float32)

    @jax.jit
    def run(sph, *ins):
        return pl.pallas_call(
            body,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(sph.shape, lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)] + [ray_spec] * 7,
            out_specs=(ray_spec,) * 3 + (ray_spec,),
            out_shape=(f32s,) * 3 + (jax.ShapeDtypeStruct(shape2, jnp.int32),),
        )(sph, *ins)

    key = jax.random.PRNGKey(0)
    sph = jax.random.normal(key, (7, args.spheres), jnp.float32)
    ins = [jax.random.normal(jax.random.fold_in(key, i), shape2)
           for i in range(7)]
    out = run(sph, *ins)
    jax.block_until_ready(out)
    times = []
    for i in range(args.runs):
        ins[0] = ins[0] + 1e-7
        t0 = time.perf_counter()
        out = run(sph, *ins)
        float(out[0].sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"tiles={num_tiles} tile_rays={args.tile_rays}: total={best*1e3:.2f}ms "
          f"per_tile={best/num_tiles*1e6:.2f}us "
          f"times={[round(t*1e3,2) for t in times]}")


if __name__ == "__main__":
    main()
