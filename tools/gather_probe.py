#!/usr/bin/env python3
"""Micro-benchmark the XLA-side compaction primitives on the real TPU:
stable-partition permutation (argsort of group keys) + gathering 13 state
planes at group granularity g.

Usage: python tools/gather_probe.py [--n 3686400] [--gs 8 32 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1280 * 720 * 4)
    ap.add_argument("--gs", type=int, nargs="+", default=[1, 8, 32, 128])
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import functools

    n = args.n

    @functools.partial(jax.jit, static_argnames=("g",))
    def compact(alive, planes, salt, g):
        ng = n // g
        galive = (alive + salt * 0.0).reshape(ng, g).max(axis=1) > 0.0
        key = jnp.arange(ng, dtype=jnp.int32) + (~galive).astype(jnp.int32) * ng
        order = jnp.argsort(key)
        out = [jnp.take(p.reshape(ng, g), order, axis=0).reshape(n)
               for p in planes]
        return out

    @functools.partial(jax.jit, static_argnames=("g",))
    def compact_bundled(alive, planes, salt, g):
        ng = n // g
        galive = (alive + salt * 0.0).reshape(ng, g).max(axis=1) > 0.0
        key = jnp.arange(ng, dtype=jnp.int32) + (~galive).astype(jnp.int32) * ng
        order = jnp.argsort(key)
        bundle = jnp.concatenate([p.reshape(ng, g) for p in planes], axis=1)
        bundle = jnp.take(bundle, order, axis=0)
        return [bundle[:, i * g:(i + 1) * g].reshape(n)
                for i in range(len(planes))]

    key = jax.random.PRNGKey(0)
    alive = (jax.random.uniform(key, (n,)) < 0.3).astype(jnp.float32)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (n,))
              for i in range(13)]

    for fn, tag in ((compact, "planar"), (compact_bundled, "bundled")):
        for g in args.gs:
            out = fn(alive, planes, jnp.float32(0.0), g)
            jax.block_until_ready(out)
            times = []
            for i in range(args.runs):
                t0 = time.perf_counter()
                out = fn(alive, planes, jnp.float32(i + 1.0), g)
                float(out[0].sum())
                times.append(time.perf_counter() - t0)
            print(f"{tag} g={g}: best={min(times)*1e3:.2f}ms "
                  f"times={[round(t*1e3,2) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
