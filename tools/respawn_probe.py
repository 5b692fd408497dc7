#!/usr/bin/env python3
"""Measure the persistent-lane sample-respawn megakernel on real TPU.

Compares the respawn engine (kernels/megakernel._respawn_kernel) against the
one-shot megakernel at chosen workloads — ray-count parity is asserted on
hardware (compiled Mosaic, not interpreter), and both single-dispatch and
sustained timings are reported.

The target is the reference's own published headline profile
(1280x720 @ 250 spp @ MAX_BOUNCES 50, common.h:23-28): the one-shot kernel
measures 39.7 mrays/s there (round 2) because whole-tile early exit strands
2.4-3.3x dead-lane work at deep bounce budgets; the respawn kernel retires
rays per-lane.

Usage:
  python tools/respawn_probe.py --mode quick      # parity smoke on TPU
  python tools/respawn_probe.py --mode headline   # 4 spp / 10 bounces
  python tools/respawn_probe.py --mode full       # 250 spp / 50 bounces
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(scene, cfg, label, respawn, runs=2, n_real=None, check=None,
             **kw):
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    import numpy as np
    camera = scene.camera.build()
    t0 = time.perf_counter()
    img, num_rays = render_image_pallas(scene.spheres, camera, cfg,
                                        n_real=n_real, respawn=respawn, **kw)
    s = float(img.sum())
    print(f"{label}: warm+compile {time.perf_counter() - t0:.1f}s "
          f"rays={int(num_rays)} img_sum={s:.4f}", flush=True)
    times = []
    for i in range(runs):
        sph = dataclasses.replace(
            scene.spheres, center_x=scene.spheres.center_x + (i + 1) * 1e-7)
        t0 = time.perf_counter()
        img, num_rays = render_image_pallas(sph, camera, cfg, n_real=n_real,
                                            respawn=respawn, **kw)
        float(img.sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    rays = int(num_rays)
    print(f"{label}: best={best:.3f}s rays={rays} -> "
          f"{rays / best / 1e6:.2f} mrays/s "
          f"times={[round(t, 3) for t in times]}", flush=True)
    if check is not None:
        ref_img, ref_rays = check
        d = np.abs(np.asarray(img) - np.asarray(ref_img))
        print(f"{label}: parity vs one-shot: rays {rays} vs {ref_rays} "
              f"(eq={rays == ref_rays}) maxdiff={d.max():.3g}", flush=True)
    return img, rays, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="quick",
                    choices=["quick", "headline", "mid", "full"])
    ap.add_argument("--scene", default="large")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tile-lanes", type=int, default=2048)
    ap.add_argument("--sync-every", type=int, default=0)
    ap.add_argument("--skip-oneshot", action="store_true")
    ap.add_argument("--skip-respawn", action="store_true")
    ap.add_argument("--wavefront", default="",
                    help="semicolon-separated row-compaction schedules to "
                         "also measure, e.g. '6,44;3,6,8,12,21'"
                         " (50-bounce wavefront study, VERDICT r2 item 1b)")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.scene import builders

    if args.mode == "quick":
        cfg = RenderConfig(width=80, height=60, spp=4, max_bounces=10)
    elif args.mode == "headline":
        cfg = RenderConfig(width=1280, height=720, spp=4, max_bounces=10)
    elif args.mode == "mid":
        # 50-bounce workload small enough for the wavefront engine's
        # materialized ray stream (46M rays < 2^26 would fail; 50 spp is
        # 46M > 2^26 -> use 25 spp = 23M).
        cfg = RenderConfig(width=1280, height=720, spp=25, max_bounces=50)
    else:
        cfg = RenderConfig(width=1280, height=720, spp=250, max_bounces=50)

    scene = builders.SCENES[args.scene](cfg.aspect)
    kw = dict(tile_rays=args.tile_lanes, sync_every=args.sync_every)

    check = None
    if not args.skip_oneshot:
        img, rays, _ = run_case(scene, cfg, f"{args.mode}/one-shot", False,
                                runs=args.runs, n_real=scene.n_real, **kw)
        check = (img, rays)
    if not args.skip_respawn:
        run_case(scene, cfg, f"{args.mode}/respawn", True, runs=args.runs,
                 n_real=scene.n_real, check=check, **kw)
    for spec in [s for s in args.wavefront.split(";") if s]:
        sched = tuple(int(x) for x in spec.split(","))
        run_case(scene, cfg, f"{args.mode}/wavefront={spec}", False,
                 runs=args.runs, n_real=scene.n_real, check=check,
                 wavefront=sched, **kw)


if __name__ == "__main__":
    main()
