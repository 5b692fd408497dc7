"""Inverse rendering demo (BASELINE.json config 4).

Perturb the small scene's sphere positions/albedos, then recover them by
Adam through the differentiable renderer, fitting to the unperturbed render.

    python examples/inverse_rendering.py [--steps 120] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--checkpoint", default="")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import numpy as np
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.grad.inverse import (InverseConfig, fit_scene,
                                             render_for_loss)
    from rays1bench_tpu.scene.builders import create_small_scene

    # BASELINE config 4: small scene, 200x100, 4 spp, max-depth 10.
    cfg = RenderConfig(width=200, height=100, spp=4, max_bounces=10,
                       early_exit=False, ray_chunk=131072)
    # pad_multiple=8: the differentiable XLA path sweeps every SoA row
    # densely, so don't carry 120 placeholder rows through the VJP
    # (2x grad-step speed, tools/grad_bench.py).
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()

    target = render_for_loss(scene.spheres, camera, cfg)

    # Perturb albedos — the cleanly recoverable parameters. Geometry
    # (centers/radii) has fixed-topology gradients that exclude silhouette
    # motion (SURVEY.md §7.3) AND Adam's per-parameter normalization blows
    # up the junk gradients of insensitive spheres, so a naive joint
    # geometry fit diverges; geometry recovery is demonstrated on a
    # silhouette-free setup in tests/test_grad.py instead.
    ax = np.asarray(scene.spheres.albedo_x).copy()
    ay = np.asarray(scene.spheres.albedo_y).copy()
    ax[0] *= 1.8; ay[0] *= 0.4
    ax[1] *= 0.5; ay[1] *= 1.2
    perturbed = dataclasses.replace(
        scene.spheres,
        albedo_x=scene.spheres.albedo_x * 0 + ax,
        albedo_y=scene.spheres.albedo_y * 0 + ay,
    )

    inv = InverseConfig(learning_rate=args.lr, steps=args.steps,
                        optimize=("albedo_x", "albedo_y"))
    fitted, losses = fit_scene(perturbed, camera, target, cfg, inv,
                               verbose=True,
                               checkpoint_path=args.checkpoint or None)
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e} "
          f"({losses[0] / max(losses[-1], 1e-12):.0f}x reduction)")
    err0 = np.abs(np.asarray(perturbed.albedo_x) - np.asarray(scene.spheres.albedo_x))[:3]
    err1 = np.abs(np.asarray(fitted.albedo_x) - np.asarray(scene.spheres.albedo_x))[:3]
    print("albedo_x abs error before:", np.round(err0, 4))
    print("albedo_x abs error after: ", np.round(err1, 4))


if __name__ == "__main__":
    main()
