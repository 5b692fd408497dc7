"""SPMD sharded rendering over a device mesh.

Replaces the reference's tile scheduler (rayweek1.cpp:785-842): primary rays
are statically split across the mesh's "rays" axis via `shard_map`; the sphere
SoA and camera are replicated (in_specs P()); the ray counter is psum-reduced
over ICI — the collective analog of the reference's thread-join reduction
(rayweek1.cpp:809-813). Because the RNG is stateless in the global ray id, the
sharded image is bit-identical to the single-device one.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.render.camera import Camera
from rays1bench_tpu.render.pipeline import _trace_chunk, _round_up
from rays1bench_tpu.scene.soa_spheres import SphereSOA
from rays1bench_tpu.scene.spheres import prepare


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name"))
def render_image_sharded(spheres_soa: SphereSOA, camera: Camera,
                         cfg: RenderConfig, mesh: Mesh,
                         axis_name: str = "rays"
                         ) -> Tuple[jax.Array, jax.Array]:
    """Render with primary rays sharded over `mesh`'s `axis_name` axis.

    Returns (image float32[H, W, 3], num_rays uint32) — numerically identical
    to render_image() regardless of device count.
    """
    n_dev = mesh.shape[axis_name]
    n = cfg.num_primary_rays
    # Each device gets whole chunks; pad the ray stream to n_dev * chunk.
    chunk = min(cfg.ray_chunk, _round_up(-(-n // n_dev), 1024))
    per_dev = _round_up(-(-n // n_dev), chunk)
    padded = per_dev * n_dev
    num_chunks = per_dev // chunk

    ids = jnp.arange(padded, dtype=jnp.int32).reshape(n_dev, num_chunks, chunk)
    seed = jnp.uint32(cfg.seed)
    spheres = prepare(spheres_soa)

    def local(ids_local, spheres, camera):
        # ids_local: (1, num_chunks, chunk) block of this device's rays.
        def body(ray_id):
            return _trace_chunk(spheres, camera, ray_id, ray_id < n, seed, cfg)
        rr, rg, rb, counts = jax.lax.map(body, ids_local[0])
        count = jax.lax.psum(jnp.sum(counts), axis_name)
        return rr[None], rg[None], rb[None], count

    rr, rg, rb, count = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
    )(ids, spheres, camera)

    rad = jnp.stack([rr.reshape(-1)[:n], rg.reshape(-1)[:n],
                     rb.reshape(-1)[:n]], axis=-1)
    image = rad.reshape(cfg.height, cfg.width, cfg.spp, 3).mean(axis=2)
    return image, count


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name", "tile_rays",
                                   "unroll", "n_real", "interpret"))
def render_image_pallas_sharded(spheres_soa: SphereSOA, camera: Camera,
                                cfg: RenderConfig, mesh: Mesh,
                                axis_name: str = "rays",
                                tile_rays: int = 2048, unroll: int = 0,
                                n_real=None, interpret: bool = False
                                ) -> Tuple[jax.Array, jax.Array]:
    """The production multi-chip path: the Pallas megakernel under shard_map.

    Pixel-tile slots are statically split across the mesh's `axis_name` axis
    (whole kernel tiles per device — the SPMD replacement for the reference's
    atomic tile queue, rayweek1.cpp:830-842); the trimmed sphere SoA and
    camera are replicated; each device runs trace_pallas on its slice; the
    ray counter is psum-reduced over ICI. Stateless RNG on global ray ids
    makes the image bit-identical to the single-device megakernel render.
    """
    from rays1bench_tpu.kernels.megakernel import trace_pallas
    from rays1bench_tpu.kernels.pipeline import (_tile_order, _tile_coords,
                                                 _slot_of_id, prepare_trimmed)
    from rays1bench_tpu.core import rng as rng_mod

    spheres, bounds, unroll = prepare_trimmed(spheres_soa, unroll,
                                              "sort_trim", 64, n_real)
    assert bounds is None
    n = cfg.num_primary_rays
    n_dev = mesh.shape[axis_name]
    ids_np, _, _, inv_np, (gy, gx, th, tw) = _tile_order(
        cfg.width, cfg.height, cfg.spp, tile_rays)
    n_slots = len(ids_np)
    per_dev = _round_up(-(-n_slots // n_dev), tile_rays)
    seed = jnp.uint32(cfg.seed)

    def local(spheres, camera):
        slot0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * per_dev
        slot = slot0 + jax.lax.iota(jnp.int32, per_dev)
        ray_id, x, y = _tile_coords(cfg, (gy, gx, th, tw), slot=slot)
        ju, jv = rng_mod.pixel_jitter(seed, ray_id)
        s = (x + ju) * jnp.float32(1.0 / cfg.width)
        t = (y + jv) * jnp.float32(1.0 / cfg.height)
        ox, oy, oz, dx, dy, dz = camera.generate_rays(s, t, seed, ray_id)
        (rr, rg, rb), nr = trace_pallas(spheres, ox, oy, oz, dx, dy, dz,
                                        ray_id, cfg, tile_rays=tile_rays,
                                        unroll=unroll, n_rays=n,
                                        interpret=interpret)
        count = jax.lax.psum(nr, axis_name)
        return rr[None], rg[None], rb[None], count

    # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
    # metadata, which the vma checker (on by default) rejects inside
    # shard_map.
    rr, rg, rb, count = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False,
    )(spheres, camera)

    def unpermute(a):
        a = a.reshape(-1)[:n_slots]
        if inv_np is None:
            return a.reshape(gy, gx, th, tw, cfg.spp).transpose(
                0, 2, 1, 3, 4).reshape(cfg.height, cfg.width, cfg.spp)
        return jnp.take(a, _slot_of_id(cfg, (gy, gx, th, tw))).reshape(
            cfg.height, cfg.width, cfg.spp)

    rad = jnp.stack([unpermute(rr), unpermute(rg), unpermute(rb)], axis=-1)
    return rad.mean(axis=2), count
