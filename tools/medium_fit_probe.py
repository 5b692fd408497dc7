#!/usr/bin/env python3
"""Multi-sphere inverse rendering on the MEDIUM scene at full resolution.

Round-4 verdict missing-item 2: every demonstrated fit was one sphere on
the small scene. This probe fits the 46-sphere medium scene
(reference: src/latest/rayweek1.cpp:582-651) from a rendered target on the
real TPU, in two stages:

  stage 1  ALL 46 spheres' albedos (138 parameters), exact renderer,
           fused megakernel gradient engine (the scene's 48 rows ride the
           unrolled fused backward).
  stage 2  the perturbed spheres' centers, soft-silhouette renderer
           (rows-masked — Adam walks unobserved rows otherwise), band
           width scaled to the pixel footprint: the calibrated 0.005 world
           units ~ 1.5 px at 1280 wide; at W px use 0.005 * 1280 / W
           (measured at 96 px: the unscaled band is 0.1 px and the
           geometry gradient vanishes).

Records 'medium WxH @ spp, stages, steps|elapsed|steps_per_sec|recovery|'
to --record for RESULTS.md's gradient table.

Usage: python tools/medium_fit_probe.py [--width 1280 --height 720]
           [--spp 4] [--steps1 60 --steps2 150] [--engine auto]
           [--record records/grad/medium_fit.txt]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--steps1", type=int, default=60)
    ap.add_argument("--steps2", type=int, default=150)
    ap.add_argument("--lr1", type=float, default=1e-2)
    ap.add_argument("--lr2", type=float, default=2e-3)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pipeline", "mega"])
    ap.add_argument("--scan", type=int, default=10,
                    help="Adam steps chained per dispatch")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--record", default="")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.grad.inverse import (InverseConfig, fit_scene,
                                             render_for_loss)
    from rays1bench_tpu.scene.builders import create_medium_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=10, early_exit=False, seed=5)
    scene = create_medium_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()
    n = scene.n_real
    soft = 0.005 * 1280.0 / args.width

    # Deterministic multiplicative albedo jitter on every real sphere +
    # center shifts on two well-observed lambertians (rows 1, 2: the front
    # spheres at (+-2|0, 0, -1), rayweek1.cpp:588-591).
    rng = np.random.RandomState(11)
    fac = 0.6 + 0.9 * rng.rand(3, scene.spheres.albedo_x.shape[0])
    fac[:, n:] = 1.0
    crows = (1, 2)
    pert = dataclasses.replace(
        scene.spheres,
        albedo_x=jnp.clip(scene.spheres.albedo_x * fac[0], 0, 1),
        albedo_y=jnp.clip(scene.spheres.albedo_y * fac[1], 0, 1),
        albedo_z=jnp.clip(scene.spheres.albedo_z * fac[2], 0, 1),
        center_x=scene.spheres.center_x.at[1].add(0.05),
        center_y=scene.spheres.center_y.at[2].add(0.04))

    print(f"rendering targets ({args.width}x{args.height} @ {args.spp} spp, "
          f"soft band {soft:g}) ...", flush=True)
    target = render_for_loss(scene.spheres, camera, cfg, engine=args.engine)
    float(target.sum())
    cfg_soft = cfg.replace(soft_silhouette=soft)
    target_soft = render_for_loss(scene.spheres, camera, cfg_soft,
                                  engine=args.engine)
    float(target_soft.sum())

    t0 = time.perf_counter()
    inv1 = InverseConfig(learning_rate=args.lr1, steps=args.steps1,
                         optimize=("albedo_x", "albedo_y", "albedo_z"))
    s1, l1 = fit_scene(pert, camera, target, cfg, inv1, engine=args.engine,
                       scan_steps=args.scan, verbose=True)
    t1 = time.perf_counter()
    inv2 = InverseConfig(learning_rate=args.lr2, steps=args.steps2,
                         optimize=("center_x", "center_y"), rows=crows)
    s2, l2 = fit_scene(s1, camera, target_soft, cfg_soft, inv2,
                       engine=args.engine, scan_steps=args.scan,
                       verbose=True)
    t2 = time.perf_counter()

    print(f"\nstage1 (albedos x{n}): {args.steps1} steps in {t1 - t0:.1f}s "
          f"({args.steps1 / (t1 - t0):.1f} steps/s incl compile), "
          f"loss {l1[0]:.3e} -> {l1[-1]:.3e}")
    print(f"stage2 (centers rows {crows}, soft {soft:g}): {args.steps2} "
          f"steps in {t2 - t1:.1f}s ({args.steps2 / (t2 - t1):.1f} steps/s "
          f"incl compile), loss {l2[0]:.3e} -> {l2[-1]:.3e}")

    errs = {}
    ok = True
    for nm in ("albedo_x", "albedo_y", "albedo_z"):
        e0 = np.abs(np.asarray(getattr(pert, nm))[:n]
                    - np.asarray(getattr(scene.spheres, nm))[:n]).mean()
        e1 = np.abs(np.asarray(getattr(s2, nm))[:n]
                    - np.asarray(getattr(scene.spheres, nm))[:n]).mean()
        errs[nm] = (e0, e1)
        ok &= e1 < 0.25 * e0
        print(f"  {nm:9s}: mean |err| {e0:.4f} -> {e1:.4f} over {n} spheres")
    for nm, row, d0 in (("center_x", 1, 0.05), ("center_y", 2, 0.04)):
        e1 = abs(float(np.asarray(getattr(s2, nm))[row])
                 - float(np.asarray(getattr(scene.spheres, nm))[row]))
        errs[nm] = (abs(d0), e1)
        ok &= e1 < 0.5 * abs(d0)
        print(f"  {nm:9s}[{row}]: |err| {abs(d0):.4f} -> {e1:.4f}")
    print("RECOVERED" if ok else "NOT RECOVERED")

    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        label = (f"medium 46-sphere fit {args.width}x{args.height} @ "
                 f"{args.spp} spp, {args.engine}, albedos x{args.steps1} + "
                 f"soft centers x{args.steps2}")
        res = " ".join(f"{k}={a:.4f}->{b:.4f}" for k, (a, b) in errs.items())
        rate = (args.steps1 + args.steps2) / (t2 - t0)
        with open(args.record, "a") as f:
            f.write(f"{label}|{t2 - t0:.1f}s|{rate:.2f}|{res}|\n")


if __name__ == "__main__":
    main()
