#!/usr/bin/env python3
"""Benchmark inverse-rendering gradient steps on the real TPU
(BASELINE.json config 4: small scene, 200x100 @ 4 spp, max-depth 10).

Reports grad-steps/s single-dispatch and sustained (N steps chained in one
jit via lax.scan, amortizing the ~29 ms tunnel round trip).

Usage: python tools/grad_bench.py [--steps 8] [--pallas-intersect]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--xla-intersect", action="store_true",
                    help="force the dense XLA intersection sweep (the "
                         "gradient path default is the Pallas index kernel)")
    ap.add_argument("--engine", default="pipeline",
                    choices=["pipeline", "mega", "auto"],
                    help="gradient engine: 'pipeline' = fixed-trip XLA "
                         "forward + jax.vjp backward (Pallas index "
                         "intersector unless --xla-intersect); 'mega' = "
                         "megakernel forward + fused Pallas backward "
                         "(kernels/mega_backward.py)")
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--height", type=int, default=100)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scene", default="small",
                    choices=["small", "medium", "large"])
    ap.add_argument("--soft", type=float, default=0.0,
                    help="cfg.soft_silhouette band width (world units); "
                         "> 0 measures the SILHOUETTE gradient step "
                         "(detached two-branch estimator + U-statistic "
                         "loss: two independent renders per loss eval)")
    ap.add_argument("--record", default="",
                    help="append a 'label|s_per_step|steps_per_sec|' record "
                         "line (the sustained number) to this file — the "
                         "source for RESULTS.md's __RESULTS_GRAD__ table "
                         "(bench/report_cli.grad_table)")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.grad.inverse import (InverseConfig, image_loss,
                                             make_train_step, params_of,
                                             render_for_loss)
    from rays1bench_tpu.scene import builders
    import optax

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=10, early_exit=False,
                       pallas_intersect=False if args.xla_intersect else None,
                       soft_silhouette=args.soft)
    # pad_multiple=8: the differentiable XLA path sweeps every SoA row
    # densely, so don't carry 120 placeholder rows through the VJP. The
    # large scene on the fused engine instead pads to 128 (484 -> 512 rows):
    # the blocked backward wants 8-row alignment and Mosaic compiles
    # power-of-two sweep lengths an order of magnitude faster (CLAUDE.md).
    build = getattr(builders, f"create_{args.scene}_scene")
    pad = 128 if (args.engine in ("mega", "auto")
                  and args.scene == "large") else 8
    scene = build(cfg.aspect, pad_multiple=pad)
    camera = scene.camera.build()
    target = render_for_loss(scene.spheres, camera, cfg)

    inv = InverseConfig()
    step, optimizer = make_train_step(scene.spheres, camera, cfg, inv,
                                      engine=args.engine)
    params = params_of(scene.spheres, inv.optimize)
    opt_state = optimizer.init(params)

    # single-dispatch step timing
    params1, opt1, loss = step(params, opt_state, target)
    float(loss)
    times = []
    for i in range(args.runs):
        p = {k: v + (i + 1) * 1e-7 for k, v in params.items()}
        t0 = time.perf_counter()
        _, _, loss = step(p, opt_state, target)
        float(loss)
        times.append(time.perf_counter() - t0)
    single = min(times)

    # sustained: N chained steps in one jit
    opt_tx = optax.adam(inv.learning_rate)

    @jax.jit
    def steps_n(params, opt_state, target):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(image_loss)(
                params, scene.spheres, camera, target, cfg, None,
                args.engine)
            updates, opt_state = opt_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=args.steps)
        return losses

    losses = steps_n(params, opt_state, target)
    float(losses.sum())
    times = []
    for i in range(args.runs):
        p = {k: v + (i + 1) * 1e-7 for k, v in params.items()}
        t0 = time.perf_counter()
        losses = steps_n(p, opt_state, target)
        float(losses.sum())
        times.append(time.perf_counter() - t0)
    sust = min(times) / args.steps
    if args.engine in ("mega", "auto"):
        tag = "fused-mega"
    else:
        tag = "xla-intersect" if args.xla_intersect else "pallas-intersect"
    if args.soft:
        tag = f"soft-silhouette {args.soft:g}, {tag}"
    print(f"grad step ({args.scene} {args.width}x{args.height}@{args.spp}spp, "
          f"{tag}): single={single*1e3:.1f}ms "
          f"({1/single:.1f} steps/s) sustained={sust*1e3:.2f}ms "
          f"({1/sust:.1f} steps/s, {args.steps} chained) "
          f"loss0={float(losses[0]):.3e}", flush=True)
    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        label = (f"{args.scene} {args.width}x{args.height} @ {args.spp} spp, "
                 f"{tag}, sustained x{args.steps}")
        with open(args.record, "a") as f:
            f.write(f"{label}|{sust:.4f}s|{1/sust:.1f}|\n")


if __name__ == "__main__":
    main()
