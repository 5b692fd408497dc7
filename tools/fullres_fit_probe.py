#!/usr/bin/env python3
"""Production-scale silhouette fitting: recover moved + resized geometry at
FULL 1280x720 resolution on the real TPU.

The soft-silhouette estimator (cfg.soft_silhouette: near-miss promotion +
detached two-branch sampling, render/intersect.py / render/integrator.py)
with the cross-seed U-statistic loss (grad/inverse.image_loss) runs through
the Pallas closest-hit index kernel and the save-only-topology remat policy,
which is what makes the soft gradient fit in HBM at full resolution at all
(the dense-XLA grad path OOMs there — PARITY.md). This probe is the
round-3 verdict item 2 "done" check: perturb a sphere of the real small
scene (center x/y + radius), fit it back against a full-resolution target,
and report parameter recovery + wall time.

Measured 2026-08-20 (one v5e): soft grad step at 1280x720 @ 4 spp =
374 ms sustained (tools/grad_bench.py --soft 0.005) -> a 150-step fit is
~1 minute of compute.

Usage: python tools/fullres_fit_probe.py [--steps 150] [--width 1280]
           [--height 720] [--spp 4] [--record records/grad/fullres_fit.txt]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--soft", type=float, default=0.005)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pipeline", "mega"])
    ap.add_argument("--scan", type=int, default=1,
                    help="Adam steps chained per dispatch (lax.scan; "
                         "amortizes the ~29 ms tunnel round trip)")
    ap.add_argument("--record", default="")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import dataclasses
    import numpy as np
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.grad.inverse import (InverseConfig, make_train_step,
                                             params_of, render_for_loss)
    from rays1bench_tpu.scene.builders import create_small_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=10, early_exit=False, seed=3,
                       soft_silhouette=args.soft)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()

    print(f"rendering target ({args.width}x{args.height} @ {args.spp} spp, "
          f"soft {args.soft:g}) ...", flush=True)
    target = render_for_loss(scene.spheres, camera, cfg)
    float(target.sum())

    # The calibrated perturbation from tests/test_grad.py::
    # test_soft_silhouette_recovers_geometry, at 13.3x the pixel count.
    pert = dataclasses.replace(
        scene.spheres,
        center_x=scene.spheres.center_x.at[0].add(0.06),
        center_y=scene.spheres.center_y.at[0].add(-0.04),
        radius=scene.spheres.radius.at[0].add(-0.03))

    inv = InverseConfig(learning_rate=args.lr, steps=args.steps,
                        optimize=("center_x", "center_y", "radius"))
    step, optimizer = make_train_step(pert, camera, cfg, inv,
                                      engine=args.engine,
                                      scan_steps=args.scan)
    params = params_of(pert, inv.optimize)
    opt_state = optimizer.init(params)

    print("compiling + fitting ...", flush=True)
    import numpy as _np
    t0 = time.perf_counter()
    losses = []
    i = 0
    timed_from = 0
    while i < args.steps:
        params, opt_state, loss = step(params, opt_state, target)
        chunk = ([float(x) for x in _np.asarray(loss)]
                 if args.scan > 1 else [float(loss)])
        if i == 0:
            t0 = time.perf_counter()  # after the compile barrier
            timed_from = len(chunk)
        losses.extend(chunk)
        i += len(chunk)
        if i % 25 < len(chunk) or i >= args.steps:
            print(f"step {i - 1:4d}  loss {losses[-1]:.3e}", flush=True)
    elapsed = time.perf_counter() - t0
    timed_steps = max(1, len(losses) - timed_from)

    truth = scene.spheres
    errs = {}
    print(f"\nfit: {len(losses)} steps ({timed_steps} timed) in "
          f"{elapsed:.1f}s ({timed_steps / elapsed:.2f} steps/s, + compile)")
    ok = True
    for name, before in (("center_x", 0.06), ("center_y", -0.04),
                         ("radius", -0.03)):
        err = abs(float(np.asarray(params[name])[0])
                  - float(np.asarray(getattr(truth, name))[0]))
        frac = err / abs(before)
        errs[name] = frac
        ok &= frac < 0.3
        print(f"  {name:9s}: |err| {err:.5f}  ({frac * 100:.1f}% of initial "
              f"{before:+.3f})")
    print("RECOVERED" if ok else "NOT RECOVERED (>30% residual)")

    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        label = (f"small {args.width}x{args.height} @ {args.spp} spp, soft "
                 f"{args.soft:g}, {args.engine}"
                 + (f" scan {args.scan}" if args.scan > 1 else "")
                 + f", {args.steps} steps")
        res = " ".join(f"{k}={v * 100:.1f}%" for k, v in errs.items())
        with open(args.record, "a") as f:
            f.write(f"{label}|{elapsed:.1f}s|{timed_steps / elapsed:.2f}|"
                    f"{res}|\n")


if __name__ == "__main__":
    main()
