#!/usr/bin/env python3
"""Calibrate the soft-silhouette gradient estimator (CPU).

The detached two-branch estimator (render/integrator._bounce_step,
render/intersect.hit_record_from_index) makes two separable claims:

  1. SELF-CONSISTENCY: autodiff through the estimator is an unbiased
     estimate of d/dtheta E[soft render] — checked by comparing the
     seed-averaged analytic gradient against seed-averaged central
     differences of the soft render itself (r_self ~ 1).
  2. RELAXATION QUALITY: d/dtheta E[soft render] approaches the HARD
     render's silhouette derivative as soft_silhouette -> 0 — checked
     against seed-averaged central differences of the hard renderer
     (r_hard -> 1 with an O(soft_silhouette) curvature bias).

Both sides are Monte-Carlo estimates, so everything is averaged over seeds
and reported with standard errors. The functional is LINEAR in the image
(sum of frozen weights x pixels) so that seed-averaged FD estimates the
derivative of the expected image — FD of a squared loss of a stochastic
image would mix in variance derivatives.

This is the measurement behind test_grad.py's soft-silhouette bounds and
the soft_silhouette docs in core/config.py. Run:
    python tools/soft_silhouette_calibration.py [--eps-list 0.1,0.03]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps-list", default="0.1,0.03",
                    help="soft_silhouette widths to calibrate")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--fd-step", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.scene.builders import create_small_scene
    from rays1bench_tpu.grad.inverse import (params_of, with_params,
                                             render_for_loss)

    kw = dict(width=96, height=54, max_bounces=8, early_exit=False,
              ray_chunk=16384)
    scene = create_small_scene(16 / 9, pad_multiple=8)
    camera = scene.camera.build()
    params0 = params_of(scene.spheres, ("center_x", "radius"))
    params0["center_x"] = params0["center_x"].at[0].add(0.05)
    params0["radius"] = params0["radius"].at[0].add(-0.03)

    cfg0 = RenderConfig(spp=args.spp, seed=0, **kw)
    # engine="pipeline": the calibration's FD baseline must be the
    # exact-albedo XLA renderer (see fd_small_scene_probe).
    img0 = render_for_loss(with_params(scene.spheres, params0), camera, cfg0,
                           engine="pipeline")
    target = render_for_loss(scene.spheres, camera, cfg0, engine="pipeline")
    w = jax.lax.stop_gradient(img0 - target)

    def L(p, cfg):
        img = render_for_loss(with_params(scene.spheres, p), camera, cfg,
                              engine="pipeline")
        return jnp.sum(w * img)

    Lj = jax.jit(L, static_argnums=1)
    gj = jax.jit(jax.grad(L), static_argnums=1)
    fd = args.fd_step

    for soft in [float(s) for s in args.eps_list.split(",") if s]:
        for name in ("center_x", "radius"):
            an, fds, fdh = [], [], []
            for s in range(args.seeds):
                cs = RenderConfig(spp=args.spp, seed=s, soft_silhouette=soft,
                                  **kw)
                ch = RenderConfig(spp=args.spp, seed=s, **kw)
                an.append(float(gj(params0, cs)[name][0]))
                pp = dict(params0)
                pp[name] = params0[name].at[0].add(fd)
                pm = dict(params0)
                pm[name] = params0[name].at[0].add(-fd)
                fds.append((float(Lj(pp, cs)) - float(Lj(pm, cs))) / (2 * fd))
                fdh.append((float(Lj(pp, ch)) - float(Lj(pm, ch))) / (2 * fd))
            an, fds, fdh = map(np.array, (an, fds, fdh))
            n = args.seeds
            print(f"soft={soft} {name}: "
                  f"analytic {an.mean():.3e} +- {an.std()/np.sqrt(n):.2e} | "
                  f"fd_soft {fds.mean():.3e} +- {fds.std()/np.sqrt(n):.2e} | "
                  f"fd_hard {fdh.mean():.3e} +- {fdh.std()/np.sqrt(n):.2e} | "
                  f"r_self={an.mean()/fds.mean():.3f} "
                  f"r_hard={an.mean()/fdh.mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
