#!/usr/bin/env python3
"""Megakernel sweep benchmark across cull modes (round-3 verdict item 5).

DECISION RECORD (2026-08-20, one v5e, records/culling.txt): the chunk-bounds
culled intersector — per-chunk bounding-sphere test + `@pl.when` skip over
Morton-sorted chunks — was measured on the 4096-row `giant` stress scene
(scene/builders.create_giant_scene, built as its best case: the camera
frustum covers a fraction of a 73x68-unit field) at 640x360 @ 4 spp,
10 bounces, sustained:

    respawn engine: sort_trim 9.97 mrays/s; bounds cs=64 8.26 (0.83x),
                    cs=128 9.04 (0.91x)
    one-shot:       sort_trim 10.59;        bounds cs=64 9.17 (0.87x),
                    cs=128 10.12 (0.95x), cs=256 10.61 (1.00x)

plus the earlier -25% on the 512-row large scene. It never wins because the
cull test unions over a whole 2048-lane tile: after one bounce the tile's
rays point everywhere (respawn lanes desynchronize besides), so almost no
chunk is skippable while every chunk pays the vector->scalar sync. The mode
was REMOVED from the megakernel (kernels/megakernel._make_intersect); this
probe remains as the instrument (now over the surviving modes) and the
decision's documentation.

Usage: python tools/culling_probe.py [--scene giant] [--width 640]
           [--height 360] [--spp 4] [--engine respawn|oneshot]
           [--record records/culling.txt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="giant",
                    choices=["small", "medium", "large", "giant"])
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=10)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--engine", default="respawn",
                    choices=["respawn", "oneshot"])
    ap.add_argument("--record", default="")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    from rays1bench_tpu.bench.harness import benchmark_sustained
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.scene import builders

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=args.max_bounces)
    scene = getattr(builders, f"create_{args.scene}_scene")(cfg.aspect)
    respawn = args.engine == "respawn"

    rows = []
    for cull in ("sort_trim", "none"):
        def render_fn(sph, cam, cfg_, _cull=cull):
            return render_image_pallas(sph, cam, cfg_, cull=_cull,
                                       n_real=scene.n_real, respawn=respawn)

        print(f"compiling + timing {args.scene} / {args.engine} / {cull} "
              "...", flush=True)
        r = benchmark_sustained(scene, cfg, frames=args.frames,
                                num_runs=args.runs, render_fn=render_fn)
        rows.append((cull, r))
        print(f"  {cull:18s}: {r.elapsed_seconds:.3f}s "
              f"{r.num_rays} rays  {r.mrays_per_sec:8.3f} mrays/s",
              flush=True)

    base = rows[0][1].mrays_per_sec
    print(f"\n{args.scene} ({scene.n_real} spheres) "
          f"{args.width}x{args.height}@{args.spp}spp mb{args.max_bounces}, "
          f"{args.engine}:")
    for label, r in rows:
        print(f"  {label:18s} {r.mrays_per_sec:8.3f} mrays/s "
              f"({r.mrays_per_sec / base:.2f}x vs sort_trim)")

    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        with open(args.record, "a") as f:
            for label, r in rows:
                f.write(f"{args.scene} {args.width}x{args.height}@"
                        f"{args.spp}spp mb{args.max_bounces} {args.engine} "
                        f"{label}|{r.elapsed_seconds:.3f}s|{r.num_rays}|"
                        f"{r.mrays_per_sec:.3f} mrays/s|\n")


if __name__ == "__main__":
    main()
