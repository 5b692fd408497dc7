#!/usr/bin/env python3
"""Time render_image_pallas under different knob settings on the real TPU.

Usage:
  python tools/perf_probe.py --scene large --spp 4 \
      --variants "tile=2048,unroll=16" "tile=2048,unroll=16,wf=2:3:6"

Each variant string is comma-separated key=value with keys:
  tile, unroll, cull (sort_trim|none), wf (colon-separated
  per-phase bounce budgets, e.g. 2:3:6).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_variant(s):
    kw = {}
    for part in s.split(","):
        k, v = part.split("=")
        if k == "tile":
            kw["tile_rays"] = int(v)
        elif k == "unroll":
            kw["unroll"] = int(v)
        elif k == "cull":
            kw["cull"] = v
        elif k == "wf":
            kw["wavefront"] = tuple(int(x) for x in v.split(":"))
        elif k == "sync":
            kw["sync_every"] = int(v)
        else:
            raise ValueError(part)
    return kw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="large")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=0,
                    help="if > 0, use the sustained (scan-batched) metric")
    ap.add_argument("--variants", nargs="+", required=True)
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.scene import builders
    import dataclasses as _dc

    cfg = RenderConfig(width=1280, height=720, spp=args.spp,
                       max_bounces=args.max_bounces)
    scene = builders.SCENES[args.scene](cfg.aspect)
    camera = scene.camera.build()

    if args.frames:
        from rays1bench_tpu.bench.harness import benchmark_sustained
        for vs in args.variants:
            kw = parse_variant(vs)
            render_fn = (lambda sph, cam, cfg_, _kw=kw: render_image_pallas(
                sph, cam, cfg_, n_real=scene.n_real, **_kw))
            res = benchmark_sustained(scene, cfg, frames=args.frames,
                                      num_runs=args.runs, render_fn=render_fn)
            print(f"{args.scene} {vs} [sustained x{args.frames}]: "
                  f"{res.mrays_per_sec:.2f} mrays/s "
                  f"per_frame={res.elapsed_seconds/args.frames*1e3:.2f}ms",
                  flush=True)
        return

    for vs in args.variants:
        kw = parse_variant(vs)
        t_compile = time.perf_counter()
        img, nrays = render_image_pallas(scene.spheres, camera, cfg,
                                         n_real=scene.n_real, **kw)
        float(img.sum())
        t_compile = time.perf_counter() - t_compile
        times = []
        for i in range(args.runs):
            sph = _dc.replace(scene.spheres,
                              center_x=scene.spheres.center_x + (i + 1) * 1e-7)
            t0 = time.perf_counter()
            img, nrays = render_image_pallas(sph, camera, cfg,
                                             n_real=scene.n_real, **kw)
            float(img.sum())
            times.append(time.perf_counter() - t0)
        best = min(times)
        mrays = int(nrays) / best / 1e6
        print(f"{args.scene} {vs}: {mrays:.2f} mrays/s "
              f"best={best*1e3:.1f}ms times={[round(t*1e3,1) for t in times]} "
              f"rays={int(nrays)} (first_call={t_compile:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
