#!/usr/bin/env python3
"""Where does the gradient step's time go? (TPU)

Times, at the same workload (sustained: N reps chained in one jit, perturbed
per rep, single readback):
  fwd-megakernel : render_image_pallas forward (the production forward)
  fwd-fixed-xla  : render_image, early_exit=False, dense XLA intersect
  fwd-fixed-pl   : render_image, early_exit=False, Pallas index intersect
  grad-xla       : value_and_grad(image_loss), dense XLA intersect
  grad-pl        : value_and_grad(image_loss), Pallas index intersect

Usage: python tools/grad_breakdown_probe.py [--width 200 --height 100 --spp 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sustained(fn, params0, reps, runs=3):
    """min over runs of (time of `reps` chained calls)/reps; fn(params)->scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(p):
        def body(carry, i):
            q = {k: v + i * 1e-7 for k, v in p.items()}
            return carry + fn(q), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(1, reps + 1, dtype=jnp.float32))
        return out
    float(chain(params0))  # compile
    times = []
    for r in range(runs):
        p = {k: v + (r + 1) * 1e-6 for k, v in params0.items()}
        t0 = time.perf_counter()
        float(chain(p))
        times.append(time.perf_counter() - t0)
    return min(times) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--height", type=int, default=100)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--scene", default="small")
    ap.add_argument("--skip", default="",
                    help="comma-separated case names to skip")
    ap.add_argument("--ray-chunk", type=int, default=0,
                    help="override cfg.ray_chunk (0 = default 131072); the "
                         "chains' cost is launch/loop-overhead dominated, "
                         "so chunking is a first-order knob")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.grad.inverse import image_loss, params_of, with_params
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.render.pipeline import render_image
    from rays1bench_tpu.scene import builders

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=10, early_exit=False,
                       **({"ray_chunk": args.ray_chunk}
                          if args.ray_chunk else {}))
    build = getattr(builders, f"create_{args.scene}_scene")
    scene = build(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()
    names = ("center_x",)
    params0 = params_of(scene.spheres, names)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    nray = cfg.num_primary_rays

    def fwd_mega(p):
        img, _ = render_image_pallas(with_params(scene.spheres, p), camera,
                                     cfg.replace(early_exit=True),
                                     n_real=scene.n_real)
        return jnp.sum(img)

    def fwd_fixed(p, pallas):
        img, _ = render_image(with_params(scene.spheres, p), camera,
                              cfg.replace(pallas_intersect=pallas))
        return jnp.sum(img)

    def grad_loss(p, pallas):
        c = cfg.replace(pallas_intersect=pallas)
        # engine="pipeline": this probe compares the XLA/Pallas-intersect
        # pipeline variants; the default "auto" would reroute every case to
        # the fused mega engine on TPU and time the same thing three times.
        loss, grads = jax.value_and_grad(image_loss)(
            p, scene.spheres, camera, target, c, None, "pipeline")
        # Fold the gradients into the returned scalar: returning only the
        # value lets XLA dead-code-eliminate the whole backward pass (it DID
        # — an earlier revision measured grad == forward to 0.1 ms).
        return loss + sum(jnp.sum(g) for g in grads.values())

    def grad_mega(p):
        from rays1bench_tpu.grad.mega import render_image_mega

        def loss_fn(q):
            img, _ = render_image_mega(with_params(scene.spheres, q), camera,
                                       cfg)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return loss + sum(jnp.sum(g) for g in grads.values())

    cases = [
        ("fwd-megakernel", fwd_mega),
        ("fwd-fixed-xla", lambda p: fwd_fixed(p, False)),
        ("fwd-fixed-pl", lambda p: fwd_fixed(p, True)),
        ("grad-xla", lambda p: grad_loss(p, False)),
        ("grad-pl", lambda p: grad_loss(p, True)),
        ("grad-mega", grad_mega),
    ]
    for name, fn in cases:
        if name in skip:
            continue
        dt = sustained(fn, params0, args.reps)
        print(f"{name:16s} {dt*1e3:8.2f} ms/step "
              f"({nray/dt/1e6:7.1f} mprimary/s)", flush=True)


if __name__ == "__main__":
    main()
