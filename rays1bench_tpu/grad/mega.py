"""Megakernel-forward gradients: fused forward, topology replay backward.

The differentiable pipeline's fixed-trip forward runs one intersection sweep
per bounce (the Pallas index kernel) and measures 22x slower than the fused
megakernel at full resolution (280 vs 12.4 ms at 1280x720 @ 4 spp —
tools/grad_breakdown_probe.py, PARITY.md memo). This module removes the
sweeps from the gradient step entirely:

  forward : kernels.pipeline.render_image_pallas_topology — ONE megakernel
            dispatch produces the image AND the per-bounce hit topology
            (winning sphere row per live lane, -1 otherwise).
  backward: jax.vjp of render.pipeline.render_image(topology=...) — the
            fixed-trip wavefront REPLAYED from the recorded indices
            (integrator.trace replay mode): every bounce's differentiable
            hit record is rebuilt by index (hit_record_from_index), the
            O(N*S) sweep never appears in the autodiff graph, and gradients
            flow through the same fixed-hit-topology chain the remat policy
            already used (SURVEY.md §7.3 reparameterization).

Semantics note (same caveat as the remat path, and as the compiled parity
study in PARITY.md): the gradient is the exact derivative of the REPLAY
render at the recorded topology. On hardware the megakernel's primal and
the replay's value differ by ULPs on boundary lanes (Mosaic vs XLA float
sequences); in interpreter/CPU mode they agree exactly
(tests/test_grad.py::test_mega_grad_matches_pipeline).

Limits: hard renderer only (the megakernel ignores cfg.soft_silhouette —
geometry/silhouette fitting stays on the XLA path, grad/inverse.py), and
scenes should be tightly padded (pad_multiple=8): topology indices are raw
SoA rows, so the forward runs cull="none".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.kernels.pipeline import render_image_pallas_topology
from rays1bench_tpu.render.pipeline import render_image


def _replay_cfg(cfg: RenderConfig) -> RenderConfig:
    """The replay is fixed-trip by construction and must not build the
    Pallas index intersector (topology replaces it). soft_silhouette is
    stripped too — the megakernel forward renders the HARD estimator, so a
    soft backward over its topology would differentiate a different
    estimator than the primal (render_image_mega asserts it is off)."""
    return cfg.replace(early_exit=False, pallas_intersect=False,
                       soft_silhouette=0.0)


@functools.lru_cache(maxsize=16)
def _make(cfg: RenderConfig, interpret: bool):
    @jax.custom_vjp
    def f(spheres_soa, camera):
        img, num_rays, _ = render_image_pallas_topology(
            spheres_soa, camera, cfg, interpret=interpret)
        return img, num_rays

    def fwd(spheres_soa, camera):
        img, num_rays, topo = render_image_pallas_topology(
            spheres_soa, camera, cfg, interpret=interpret)
        return (img, num_rays), (spheres_soa, camera, topo)

    def bwd(res, ct):
        spheres_soa, camera, topo = res
        ct_img, _ = ct  # num_rays is integer-valued (no cotangent)

        def replay_img(soa, cam):
            img, _ = render_image(soa, cam, _replay_cfg(cfg), topology=topo)
            return img

        _, vjp = jax.vjp(replay_img, spheres_soa, camera)
        return vjp(ct_img)

    f.defvjp(fwd, bwd)
    return f


def render_image_mega(spheres_soa, camera, cfg: RenderConfig,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable render through the fused megakernel forward.

    Same contract as render.pipeline.render_image — (image f32[H, W, 3],
    num_rays uint32), differentiable w.r.t. the SphereSOA leaves and the
    camera — but the forward pass is ONE megakernel dispatch and the
    backward replays from recorded hit topology (see module docstring).
    cfg.early_exit is irrelevant (the megakernel always early-exits;
    gradients are defined by the fixed-topology replay)."""
    assert not cfg.soft_silhouette, (
        "render_image_mega is the HARD renderer: the megakernel forward "
        "ignores cfg.soft_silhouette, so soft gradients here would belong "
        "to a different estimator than the primal — use the XLA path "
        "(grad/inverse.py) for silhouette fitting")
    return _make(cfg, interpret)(spheres_soa, camera)
