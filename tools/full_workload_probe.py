#!/usr/bin/env python3
"""Probe the reference's FULL workload profile (1280x720 @ 250 spp @ 50
bounces, common.h:23-28 MT profile) on one TPU chip: one-shot megakernel vs
wavefront row-compaction schedules.

Motivation: at 4 spp / 10 bounces the wavefront saves only ~3% (RESULTS),
but at 250 spp consecutive rays are samples of the SAME pixel, so row
(128-ray) death is far more coherent, and the 50-bounce tail multiplies the
dead-lane waste of the one-shot kernel (whole-tile early exit only).

OUTCOME (round 3, 2026-08-20): the question this probe asks was settled the
other way — per-lane sample respawn (tools/respawn_probe.py,
megakernel._respawn_kernel) beats every wavefront schedule 3.5x+ at deep
bounce budgets (102.5 vs 28.9 mrays/s at 25 spp/50 b) and is the production
engine; see PARITY.md. Kept for one-shot/wavefront scheduling studies.

Usage: python tools/full_workload_probe.py [--scene large] [--spp 250]
           [--schedules "one-shot;2,3,6;2,3,6,12"]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="large")
    ap.add_argument("--spp", type=int, default=250)
    ap.add_argument("--max-bounces", type=int, default=50)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--schedules", default="one-shot;2,3,6,12")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.scene import builders

    cfg = RenderConfig(width=1280, height=720, spp=args.spp,
                       max_bounces=args.max_bounces)
    scene = builders.SCENES[args.scene](cfg.aspect)
    camera = scene.camera.build()

    for spec in args.schedules.split(";"):
        wavefront = (None if spec == "one-shot"
                     else tuple(int(x) for x in spec.split(",")))
        img, num_rays = render_image_pallas(scene.spheres, camera, cfg,
                                            n_real=scene.n_real,
                                            wavefront=wavefront)
        float(img.sum())  # compile + warm
        times = []
        for i in range(args.runs):
            sph = dataclasses.replace(
                scene.spheres, center_x=scene.spheres.center_x + (i + 1) * 1e-7)
            t0 = time.perf_counter()
            img, num_rays = render_image_pallas(sph, camera, cfg,
                                                n_real=scene.n_real,
                                                wavefront=wavefront)
            float(img.sum())
            times.append(time.perf_counter() - t0)
        best = min(times)
        rays = int(num_rays)
        print(f"{args.scene} {cfg.width}x{cfg.height}@{args.spp}spp"
              f"@{args.max_bounces}b wavefront={spec}: best={best:.3f}s "
              f"rays={rays} -> {rays/best/1e6:.2f} mrays/s "
              f"times={[round(t,3) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
