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
            return _trace_chunk(spheres, camera, ray_id, ray_id < n, seed,
                                cfg, remat=num_chunks > 1)
        rr, rg, rb, counts = jax.lax.map(body, ids_local[0])
        count = jax.lax.psum(jnp.sum(counts), axis_name)
        return rr[None], rg[None], rb[None], count

    # check_vma=False: the gradient path's Pallas index kernel
    # (cfg.pallas_intersect) has out_shapes without varying-mesh-axes
    # metadata, which the vma checker rejects inside shard_map.
    rr, rg, rb, count = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False,
    )(ids, spheres, camera)

    rad = jnp.stack([rr.reshape(-1)[:n], rg.reshape(-1)[:n],
                     rb.reshape(-1)[:n]], axis=-1)
    image = rad.reshape(cfg.height, cfg.width, cfg.spp, 3).mean(axis=2)
    return image, count


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name", "tile_rays",
                                   "unroll", "cull",
                                   "wavefront", "sync_every", "n_real",
                                   "sample_axis", "interpret", "respawn",
                                   "telemetry"))
def render_image_pallas_sharded(spheres_soa: SphereSOA, camera: Camera,
                                cfg: RenderConfig, mesh: Mesh,
                                axis_name: str = "rays",
                                tile_rays: int = 2048, unroll: int = 0,
                                cull: str = "sort_trim",
                                wavefront=None, sync_every: int = 0,
                                n_real=None, sample_axis=None,
                                interpret: bool = False,
                                respawn: bool = False,
                                telemetry: bool = False
                                ) -> Tuple[jax.Array, jax.Array]:
    """The production multi-chip path: the Pallas megakernel under shard_map.

    Pixel-tile slots are statically split across the mesh's `axis_name` axis
    (whole kernel tiles per device — the SPMD replacement for the reference's
    atomic tile queue, rayweek1.cpp:830-842); the trimmed sphere SoA and
    camera are replicated; each device runs trace_pallas on its slice; the
    ray counter is psum-reduced over ICI. Stateless RNG on global ray ids
    makes the image bit-identical to the single-device megakernel render.

    Supports the full single-chip feature surface (kernels/pipeline.py
    render_image_pallas): `cull` in {"sort_trim", "none"},
    `wavefront` phase schedules with inter-phase row compaction (local to
    each device's slice — compaction is a per-device permutation, so no
    cross-device traffic), and `sync_every`.

    sample_axis: optional second mesh axis sharding the sample dimension
    (SURVEY.md §7.2-6's (tiles, samples) mesh): each device traces a
    contiguous block of pixel rows x a contiguous slice of spp. Requires
    mesh.shape[sample_axis] to divide cfg.spp. With samples innermost in
    ray_id, every device still keys the stateless RNG on global ids, so any
    mesh factorization renders the identical image.

    respawn: shard the persistent-lane sample-respawn engine instead
    (kernels/megakernel._respawn_kernel): PIXEL slots split over axis_name,
    each device's lanes tracing their pixels' sample slice serially. Per-ray
    math and ray counts are identical on any mesh; pixel values match the
    single-chip respawn render bitwise on a tile-only mesh, and up to
    sample-slice addition order when sample_axis is set.

    telemetry: additionally return a third element, a dict of per-DEVICE
    load metrics (the SPMD analog of the reference's per-thread ray
    counters, rayweek1.cpp:79-95, 809-813): "device_rays" — rays traced by
    each device's slice (uint32, mesh-axis shaped), and "device_iters" —
    kernel while-loop steps summed over the device's tiles (int32; grid
    steps run serially per core, so this is each chip's actual work, the
    load-imbalance signal tile-count parity cannot see). Not supported
    with `wavefront` (the phase kernel keeps no iteration counter).
    """
    from rays1bench_tpu.kernels.megakernel import (trace_pallas,
                                                   trace_pallas_respawn,
                                                   trace_pallas_wavefront)
    from rays1bench_tpu.kernels.pipeline import (_tile_order, _tile_coords,
                                                 _slot_of_id, prepare_trimmed,
                                                 auto_sync_every)
    from rays1bench_tpu.core import rng as rng_mod
    import math

    spheres, unroll = prepare_trimmed(spheres_soa, unroll, cull, n_real)
    n = cfg.num_primary_rays
    n_tiles = mesh.shape[axis_name]
    n_samp = mesh.shape[sample_axis] if sample_axis else 1
    assert cfg.spp % n_samp == 0, (cfg.spp, n_samp)
    spp_loc = cfg.spp // n_samp
    assert not (respawn and wavefront is not None), \
        "respawn and wavefront are alternative scheduling strategies"
    assert not (telemetry and wavefront is not None), \
        "telemetry needs the kernels' debug_iters counter (no wavefront)"
    if respawn:
        return _render_respawn_sharded(
            spheres, camera, cfg, mesh, axis_name, tile_rays, unroll,
            sync_every, sample_axis, n_samp, spp_loc, interpret, telemetry)

    ids_np, _, _, inv_np, (gy, gx, th, tw) = _tile_order(
        cfg.width, cfg.height, cfg.spp, tile_rays)
    n_slots = len(ids_np)
    # Rows (= pixel slots) per tile-axis device, padded so each device's
    # local ray count (rows * spp_loc) is whole kernel tiles.
    rows_total = n_slots // cfg.spp
    row_granule = tile_rays // math.gcd(tile_rays, spp_loc)
    rows_per_dev = _round_up(-(-rows_total // n_tiles), row_granule)
    per_dev = rows_per_dev * spp_loc
    seed = jnp.uint32(cfg.seed)
    if sync_every <= 0:
        sync_every = auto_sync_every(spheres.count)

    def local(spheres, camera):
        i = jax.lax.axis_index(axis_name).astype(jnp.int32)
        j = (jax.lax.axis_index(sample_axis).astype(jnp.int32)
             if sample_axis else jnp.int32(0))
        # local l -> global slot: row-major over this device's pixel rows,
        # sample slice j*spp_loc..(j+1)*spp_loc innermost.
        l = jax.lax.iota(jnp.int32, per_dev)
        row = i * rows_per_dev + l // spp_loc
        slot = row * cfg.spp + j * spp_loc + l % spp_loc
        ray_id, x, y = _tile_coords(cfg, (gy, gx, th, tw), slot=slot)
        ju, jv = rng_mod.pixel_jitter(seed, ray_id)
        s = (x + ju) * jnp.float32(1.0 / cfg.width)
        t = (y + jv) * jnp.float32(1.0 / cfg.height)
        ox, oy, oz, dx, dy, dz = camera.generate_rays(s, t, seed, ray_id)
        telem = ()
        if wavefront is not None:
            (rr, rg, rb), nr = trace_pallas_wavefront(
                spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
                tile_rays=tile_rays, unroll=unroll,
                schedule=wavefront, n_rays=n,
                interpret=interpret)
        elif telemetry:
            (rr, rg, rb), nr, tile_iters, _ = trace_pallas(
                spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
                tile_rays=tile_rays, unroll=unroll,
                sync_every=sync_every, n_rays=n,
                interpret=interpret, debug_iters=True)
            shp = (1, 1) if sample_axis else (1,)
            telem = (nr.reshape(shp),
                     jnp.sum(tile_iters).astype(jnp.int32).reshape(shp))
        else:
            (rr, rg, rb), nr = trace_pallas(
                spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
                tile_rays=tile_rays, unroll=unroll,
                sync_every=sync_every, n_rays=n,
                interpret=interpret)
        axes = (axis_name, sample_axis) if sample_axis else axis_name
        count = jax.lax.psum(nr, axes)
        shape = (1, 1, per_dev) if sample_axis else (1, per_dev)
        rs = lambda a: a.reshape(shape)
        return (rs(rr), rs(rg), rs(rb), count) + telem

    # check_vma=False: pallas_call's out_shapes carry no varying-mesh-axes
    # metadata, which the vma checker (on by default) rejects inside
    # shard_map.
    spec = P(axis_name, sample_axis) if sample_axis else P(axis_name)
    out_specs = (spec, spec, spec, P()) + ((spec, spec) if telemetry else ())
    outs = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )(spheres, camera)
    rr, rg, rb, count = outs[:4]

    def unpermute(a):
        # (n_tiles, n_samp, rows_per_dev, spp_loc) -> (rows, spp), then the
        # rows enumerate (gy, gx, th, tw) pixel slots as in _tile_order.
        a = a.reshape(n_tiles, n_samp, rows_per_dev, spp_loc)
        a = a.transpose(0, 2, 1, 3).reshape(-1, cfg.spp)[:rows_total]
        if inv_np is None:
            return a.reshape(gy, gx, th, tw, cfg.spp).transpose(
                0, 2, 1, 3, 4).reshape(cfg.height, cfg.width, cfg.spp)
        return jnp.take(a.reshape(-1),
                        _slot_of_id(cfg, (gy, gx, th, tw))).reshape(
            cfg.height, cfg.width, cfg.spp)

    rad = jnp.stack([unpermute(rr), unpermute(rg), unpermute(rb)], axis=-1)
    image = rad.mean(axis=2)
    if telemetry:
        return image, count, {"device_rays": outs[4], "device_iters": outs[5]}
    return image, count


def _render_respawn_sharded(spheres, camera, cfg, mesh, axis_name,
                            tile_rays, unroll, sync_every,
                            sample_axis, n_samp, spp_loc, interpret,
                            telemetry: bool = False):
    """Sample-respawn megakernel under shard_map (see
    render_image_pallas_sharded's respawn flag). PIXEL slots are split over
    axis_name in whole kernel tiles; a sample_axis device traces its pixels'
    [j*spp_loc, (j+1)*spp_loc) slice and partial pixel sums are reduced on
    the host side of the shard_map (sums are order-free)."""
    from rays1bench_tpu.kernels.megakernel import trace_pallas_respawn
    from rays1bench_tpu.kernels.pipeline import _tile_order, _tile_coords, \
        _slot_of_id, auto_sync_every

    n_tiles = mesh.shape[axis_name]
    cfgp = cfg.replace(spp=1)
    ids_np, _, _, inv_np, geom = _tile_order(cfg.width, cfg.height, 1,
                                             tile_rays)
    n_slots = len(ids_np)
    per_dev = _round_up(-(-n_slots // n_tiles), tile_rays)
    if sync_every <= 0:
        # The respawn optimum (4), NOT the one-shot kernel's heuristic — a
        # sharded respawn render must run the same schedule as single-chip.
        sync_every = auto_sync_every(
            spheres.count, respawn=True,
            steps_hint=spp_loc * (cfg.max_bounces + 1))

    def local(spheres, camera):
        i = jax.lax.axis_index(axis_name).astype(jnp.int32)
        j = (jax.lax.axis_index(sample_axis).astype(jnp.int32)
             if sample_axis else jnp.int32(0))
        slot = i * per_dev + jax.lax.iota(jnp.int32, per_dev)
        pid, x, y = _tile_coords(cfgp, geom, slot=slot)
        span = jnp.stack([j * spp_loc, (j + 1) * spp_loc]).reshape(1, 2)
        telem = ()
        if telemetry:
            (rr, rg, rb), nr, tile_iters, _ = trace_pallas_respawn(
                spheres, camera, pid, x, y, cfg, tile_lanes=tile_rays,
                unroll=unroll,
                sync_every=sync_every, interpret=interpret,
                num_pixels=cfg.num_pixels, sample_span=span,
                debug_iters=True)
            shp = (1, 1) if sample_axis else (1,)
            telem = (nr.reshape(shp),
                     jnp.sum(tile_iters).astype(jnp.int32).reshape(shp))
        else:
            (rr, rg, rb), nr = trace_pallas_respawn(
                spheres, camera, pid, x, y, cfg, tile_lanes=tile_rays,
                unroll=unroll,
                sync_every=sync_every, interpret=interpret,
                num_pixels=cfg.num_pixels, sample_span=span)
        axes = (axis_name, sample_axis) if sample_axis else axis_name
        count = jax.lax.psum(nr, axes)
        shape = (1, 1, per_dev) if sample_axis else (1, per_dev)
        rs = lambda a: a.reshape(shape)
        return (rs(rr), rs(rg), rs(rb), count) + telem

    spec = P(axis_name, sample_axis) if sample_axis else P(axis_name)
    out_specs = (spec, spec, spec, P()) + ((spec, spec) if telemetry else ())
    outs = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )(spheres, camera)
    rr, rg, rb, count = outs[:4]

    gy, gx, th, tw = geom

    def unpermute_pix(a):
        # partial sums over sample slices add here (order-free ints aside,
        # float order is the documented respawn-engine property)
        a = a.reshape(n_tiles, n_samp, per_dev).sum(axis=1)
        a = a.reshape(-1)[:n_slots]
        if inv_np is None:
            return a.reshape(gy, gx, th, tw).transpose(
                0, 2, 1, 3).reshape(cfg.height, cfg.width)
        return jnp.take(a, _slot_of_id(cfgp, geom)).reshape(
            cfg.height, cfg.width)

    rad = jnp.stack([unpermute_pix(rr), unpermute_pix(rg),
                     unpermute_pix(rb)], axis=-1)
    image = rad * jnp.float32(1.0 / cfg.spp)
    if telemetry:
        return image, count, {"device_rays": outs[4], "device_iters": outs[5]}
    return image, count
