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

cfg.soft_silhouette is supported end to end (round 4): the megakernel
forward traces the soft two-branch estimator in-kernel (graze-promotion
sweep + branch draw, kernels/megakernel._make_bounce), topology records
the PROMOTED indices, and both backwards differentiate the soft estimator
at that fixed topology (promote=False replay semantics — integrator.trace
/ kernels/mega_backward._bounce_core).

Limits: scenes should be tightly padded (pad_multiple=8 up to 64 rows;
power-of-two row counts above — Mosaic compiles those an order of magnitude
faster): topology indices are raw SoA rows, so the forward runs cull="none".
The fused backward takes up to kernels/mega_backward.MAX_SPHERES rows
(unrolled accumulators to 64 rows, the round-5 blocked path above — the
512-row large scene runs fused; see mega_backward.fused_supported).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.kernels.pipeline import (render_image_pallas_topology,
                                             slot_layout, _slot_of_id,
                                             _tile_coords)
from rays1bench_tpu.render.pipeline import render_image


def _replay_cfg(cfg: RenderConfig) -> RenderConfig:
    """The replay is fixed-trip by construction and must not build the
    Pallas index intersector (topology replaces it). cfg.soft_silhouette
    passes through: the megakernel forward now renders the SAME soft
    two-branch estimator in-kernel (megakernel._make_bounce soft_eps), its
    topology records the promoted indices, and the replay rebuilds the
    differentiable soft fields from them without re-promoting
    (integrator.trace replay intersector, promote=False)."""
    return cfg.replace(early_exit=False, pallas_intersect=False)


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


def _img_ct_to_slots(cfg: RenderConfig, geom, exact: bool, out_len: int,
                     ct_img):
    """Per-ray radiance cotangent (= d loss / d pixel mean / spp), in kernel
    slot order, length out_len (>= the grid's slot count; extra slots get 0).
    Exact grids are a pure reshape/transpose (the transpose of the pipeline's
    unpermute); padded grids take the gather fallback like the pipeline
    does."""
    n = cfg.num_primary_rays
    gy, gx, th, tw = geom
    ct_pix = ct_img * jnp.float32(1.0 / cfg.spp)  # (H, W, 3)
    if exact:
        # (H, W) = (gy, th, gx, tw) -> (gy, gx, th, tw) -> slots x spp.
        def to_slots(a):
            a = a.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3)
            a = jnp.broadcast_to(a.reshape(-1, 1),
                                 (n // cfg.spp, cfg.spp)).reshape(-1)
            return jnp.pad(a, (0, out_len - n)) if out_len > n else a
        return tuple(to_slots(ct_pix[..., c]) for c in range(3))
    ray_id, _, _ = _tile_coords(cfg, geom, out_len)
    pix = jnp.minimum(ray_id, n - 1) // cfg.spp
    valid = ray_id < n
    return tuple(
        jnp.where(valid, jnp.take(ct_pix[..., c].reshape(-1), pix), 0.0)
        for c in range(3))


def _chain_to_soa(spheres_soa, grads):
    """Chain the (10, S) PreparedSpheres-column cotangent matrix from the
    fused backward onto the SphereSOA leaves (scene/spheres.prepare:
    radius_sq = r*r; inv_radius = 1/r signed, 0 for placeholders)."""
    import dataclasses
    radius = spheres_soa.radius
    is_real = radius != 0.0
    safe_r = jnp.where(is_real, radius, 1.0)
    d_radius = (2.0 * radius * grads[3]
                + jnp.where(is_real, -grads[4] / (safe_r * safe_r), 0.0))
    return dataclasses.replace(
        spheres_soa,
        center_x=grads[0], center_y=grads[1], center_z=grads[2],
        radius=d_radius,
        mat_type=np.zeros(spheres_soa.mat_type.shape,
                          dtype=jax.dtypes.float0),
        albedo_x=grads[5], albedo_y=grads[6], albedo_z=grads[7],
        fuzz=grads[8], ref_idx=grads[9])


@functools.lru_cache(maxsize=16)
def _make_fused(cfg: RenderConfig, interpret: bool, tile_rays: int):
    """Megakernel forward + FUSED Pallas backward (kernels/mega_backward.py).

    Same gradient semantics as the replay path (_make) — the derivative of
    the fixed-topology replay — but the whole differentiable bounce chain
    runs forward AND reverse inside one Pallas kernel in VMEM instead of ~30
    N-sized HBM round trips per bounce per direction under jax.vjp. The
    sphere-column cotangents come back as a (10, S) matrix; the chain onto
    the signed radius leaf (radius_sq = r^2, inv_radius = 1/r signed —
    scene/spheres.prepare) and the camera raygen VJP close in XLA."""
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.kernels.mega_backward import backward_pallas
    from rays1bench_tpu.scene.spheres import prepare

    n = cfg.num_primary_rays
    n_slots, geom, exact = slot_layout(cfg, tile_rays)
    _ct_to_slots = functools.partial(_img_ct_to_slots, cfg, geom, exact,
                                     n_slots)

    @jax.custom_vjp
    def f(spheres_soa, camera):
        img, num_rays, _ = render_image_pallas_topology(
            spheres_soa, camera, cfg, tile_rays=tile_rays,
            interpret=interpret, slots=True)
        return img, num_rays

    def fwd(spheres_soa, camera):
        img, num_rays, topo = render_image_pallas_topology(
            spheres_soa, camera, cfg, tile_rays=tile_rays,
            interpret=interpret, slots=True)
        return (img, num_rays), (spheres_soa, camera, topo)

    def bwd(res, ct):
        spheres_soa, camera, topo = res
        ct_img, _ = ct

        # Rebuild the slot-order primary rays (identical arithmetic to the
        # forward's raygen — stateless RNG keyed on the true ray id).
        ray_id, x, y = _tile_coords(cfg, geom, n_slots)
        seed = jnp.uint32(cfg.seed)
        ju, jv = rng_mod.pixel_jitter(seed, ray_id)
        s = (x + ju) * jnp.float32(1.0 / cfg.width)
        t = (y + jv) * jnp.float32(1.0 / cfg.height)

        def raygen(cam):
            return cam.generate_rays(s, t, seed, ray_id)

        (ox, oy, oz, dx, dy, dz), vjp_raygen = jax.vjp(raygen, camera)
        ct_r, ct_g, ct_b = _ct_to_slots(ct_img)

        prep = prepare(spheres_soa)
        grads, ray_cts = backward_pallas(
            prep, ox, oy, oz, dx, dy, dz, ray_id, ct_r, ct_g, ct_b, topo,
            cfg, tile_rays=tile_rays, n_rays=n, interpret=interpret)

        (d_cam,) = vjp_raygen(ray_cts)
        return _chain_to_soa(spheres_soa, grads), d_cam

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=16)
def _make_fused_sharded(cfg: RenderConfig, interpret: bool, tile_rays: int,
                        mesh, axis_name: str):
    """Multi-chip fused gradients: megakernel topology forward AND fused
    Pallas backward under shard_map.

    Kernel slots are statically split over the mesh's `axis_name` axis in
    whole kernel tiles (the same SPMD layout as
    parallel.shard.render_image_pallas_sharded); the scene and camera are
    replicated. The forward's per-device megakernel emits its slot slice's
    topology; the backward runs kernels/mega_backward.backward_pallas on the
    same slice and psums the (10, S) sphere-cotangent matrix over ICI — the
    gradient all-reduce of SURVEY.md §5's "distributed communication
    backend", one collective per step. Per-ray cotangents stay device-local;
    the camera VJP closes in XLA over the gathered slot stream.

    Gradient values match the single-chip fused path up to float summation
    order (per-device partial sums, then the psum tree)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.kernels.mega_backward import backward_pallas
    from rays1bench_tpu.kernels.megakernel import trace_pallas
    from rays1bench_tpu.kernels.pipeline import (auto_sync_every,
                                                 prepare_trimmed)
    from rays1bench_tpu.render.pipeline import _round_up
    from rays1bench_tpu.scene.spheres import prepare

    n = cfg.num_primary_rays
    n_slots, geom, exact = slot_layout(cfg, tile_rays)
    gy, gx, th, tw = geom
    n_dev = mesh.shape[axis_name]
    per_dev = _round_up(-(-n_slots // n_dev), tile_rays)
    total = per_dev * n_dev
    nb1 = cfg.max_bounces + 1
    seed_c = jnp.uint32(cfg.seed)

    def _raygen_slots(camera, slot):
        ray_id, x, y = _tile_coords(cfg, geom, slot=slot)
        ju, jv = rng_mod.pixel_jitter(seed_c, ray_id)
        s = (x + ju) * jnp.float32(1.0 / cfg.width)
        t = (y + jv) * jnp.float32(1.0 / cfg.height)
        return ray_id, camera.generate_rays(s, t, seed_c, ray_id)

    def _image_of_slots(rr, rg, rb):
        def unpermute(a):
            a = a[:n_slots]
            if exact:
                return a.reshape(gy, gx, th, tw, cfg.spp).transpose(
                    0, 2, 1, 3, 4).reshape(cfg.height, cfg.width, cfg.spp)
            return jnp.take(a, _slot_of_id(cfg, geom)).reshape(
                cfg.height, cfg.width, cfg.spp)
        rad = jnp.stack([unpermute(rr), unpermute(rg), unpermute(rb)],
                        axis=-1)
        return rad.mean(axis=2)

    def _forward(spheres_soa, camera):
        spheres, unroll = prepare_trimmed(spheres_soa, 0, "none", None)
        sync_every = auto_sync_every(spheres.count)

        def local(spheres, camera):
            i = jax.lax.axis_index(axis_name).astype(jnp.int32)
            slot = i * per_dev + jax.lax.iota(jnp.int32, per_dev)
            ray_id, (ox, oy, oz, dx, dy, dz) = _raygen_slots(camera, slot)
            (rr, rg, rb), nr, topo = trace_pallas(
                spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
                tile_rays=tile_rays, unroll=unroll, sync_every=sync_every,
                n_rays=n, interpret=interpret, emit_topology=True)
            count = jax.lax.psum(nr, axis_name)
            return rr[None], rg[None], rb[None], topo[None], count

        rr, rg, rb, topo, count = shard_map(
            local, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P()),
            check_vma=False,
        )(spheres, camera)
        # (n_dev, nb1, per_dev) -> slot-order (nb1, total).
        topo = jnp.moveaxis(topo, 0, 1).reshape(nb1, total)
        image = _image_of_slots(rr.reshape(-1), rg.reshape(-1),
                                rb.reshape(-1))
        return image, count, topo

    @jax.custom_vjp
    def f(spheres_soa, camera):
        image, count, _ = _forward(spheres_soa, camera)
        return image, count

    def fwd(spheres_soa, camera):
        image, count, topo = _forward(spheres_soa, camera)
        return (image, count), (spheres_soa, camera, topo)

    def bwd(res, ct):
        spheres_soa, camera, topo = res
        ct_img, _ = ct

        slot = jax.lax.iota(jnp.int32, total)
        ray_id, rays = _raygen_slots(camera, slot)

        def raygen(cam):
            _, r = _raygen_slots(cam, slot)
            return r

        _, vjp_raygen = jax.vjp(raygen, camera)
        ox, oy, oz, dx, dy, dz = rays
        ct_r, ct_g, ct_b = _img_ct_to_slots(cfg, geom, exact, total, ct_img)
        prep = prepare(spheres_soa)

        def local(prep, ox, oy, oz, dx, dy, dz, ray_id, ct_r, ct_g, ct_b,
                  topo):
            grads, cts = backward_pallas(
                prep, ox, oy, oz, dx, dy, dz, ray_id, ct_r, ct_g, ct_b,
                topo, cfg, tile_rays=tile_rays, n_rays=n,
                interpret=interpret)
            grads = jax.lax.psum(grads, axis_name)
            return grads, tuple(c[None] for c in cts)

        ray_spec = P(axis_name)
        grads, ray_cts = shard_map(
            local, mesh=mesh,
            in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                      ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                      P(None, axis_name)),
            out_specs=(P(), tuple(P(axis_name) for _ in range(6))),
            check_vma=False,
        )(prep, ox, oy, oz, dx, dy, dz, ray_id, ct_r, ct_g, ct_b, topo)

        (d_cam,) = vjp_raygen(tuple(c.reshape(total) for c in ray_cts))
        return _chain_to_soa(spheres_soa, grads), d_cam

    f.defvjp(fwd, bwd)
    return f


def render_image_mega_sharded(spheres_soa, camera, cfg: RenderConfig, mesh,
                              axis_name: str = "rays",
                              tile_rays: int = 2048,
                              interpret: bool = False):
    """Differentiable multi-chip render through the fused megakernel forward
    + fused Pallas backward (see _make_fused_sharded). Same contract as
    render_image_mega, with slots sharded over `mesh`'s `axis_name` axis and
    the sphere-gradient all-reduce riding one psum."""
    return _make_fused_sharded(cfg, interpret, tile_rays, mesh,
                               axis_name)(spheres_soa, camera)


def render_image_mega(spheres_soa, camera, cfg: RenderConfig,
                      interpret: bool = False, fused: bool = True,
                      tile_rays: int = 2048
                      ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable render through the fused megakernel forward.

    Same contract as render.pipeline.render_image — (image f32[H, W, 3],
    num_rays uint32), differentiable w.r.t. the SphereSOA leaves and the
    camera — but the forward pass is ONE megakernel dispatch and the
    backward replays from recorded hit topology (see module docstring).
    cfg.early_exit is irrelevant (the megakernel always early-exits;
    gradients are defined by the fixed-topology replay).

    cfg.soft_silhouette > 0 runs the soft two-branch estimator INSIDE the
    megakernel (graze promotion + branch draw traced in-kernel,
    kernels/megakernel._make_bounce) with topology recording the promoted
    indices; the backward — fused or replay — differentiates the soft
    estimator at that fixed topology (promote=False replay semantics).

    fused=True (default): run the backward through the fused Pallas kernel
    (kernels/mega_backward.py — the whole bounce chain forward+reverse in
    VMEM); fused=False keeps the XLA replay backward (jax.vjp over
    render_image(topology=...)), the semantic reference the fused kernel is
    tested against. The fused path additionally uses EXACT albedos in both
    the replayed forward and backward (the replay path's cotangent passes
    through the megakernel primal's 8-bit albedo image)."""
    if fused:
        return _make_fused(cfg, interpret, tile_rays)(spheres_soa, camera)
    return _make(cfg, interpret)(spheres_soa, camera)
