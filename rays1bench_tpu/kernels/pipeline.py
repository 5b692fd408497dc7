"""Megakernel-backed render pipeline.

Same contract as render.pipeline.render_image (raygen -> trace -> assemble,
identical RNG lattice), with the wavefront loop fused into the Pallas
megakernel.

Ray ordering: the kernel exits a tile early only when EVERY ray in it is dead,
so rays are fed in 2D-pixel-tile order — each kernel tile covers a compact
tw x th pixel block (all spp samples together), the TPU analog of the
reference's 32x32 thread tiles (rayweek1.cpp:855-856). Spatially compact tiles
die together (a sky tile exits after one bounce), which is where the
early-exit win comes from. The stateless RNG keys off the TRUE ray id, so the
permutation cannot change the image.

When the tile grid divides the image exactly, the permutation is a pure
reshape/transpose both ways (fast on TPU); otherwise a static-index gather
unpermutes the result (TPU gathers are slow — only small/odd-shaped images
take that path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rays1bench_tpu.core import rng as rng_mod
from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.kernels import culling
from rays1bench_tpu.kernels.megakernel import trace_pallas, \
    trace_pallas_respawn, trace_pallas_wavefront
from rays1bench_tpu.render.camera import Camera
from rays1bench_tpu.scene.soa_spheres import SphereSOA
from rays1bench_tpu.scene.spheres import prepare


def _pick_tile_shape(width: int, height: int, pixels_per_tile: int
                     ) -> Optional[Tuple[int, int]]:
    """Find (tw, th) with tw*th == pixels_per_tile, tw | width, th | height.
    Prefers squarish tiles. Returns None if no exact tiling exists."""
    best = None
    tw = 1
    while tw <= pixels_per_tile:
        th = pixels_per_tile // tw
        if tw * th == pixels_per_tile and width % tw == 0 and height % th == 0:
            score = abs(np.log2(tw) - np.log2(th))
            if best is None or score < best[0]:
                best = (score, tw, th)
        tw *= 2
    return (best[1], best[2]) if best else None


@functools.lru_cache(maxsize=32)
def _tile_order(width: int, height: int, spp: int, tile_rays: int):
    """Static ray permutation: kernel slot -> true ray id.

    Slots enumerate (pixel-tile, pixel-in-tile row-major, sample). Returns
    (ids, x, y, inv, exact): numpy arrays + whether the grid tiles the image
    exactly (inv is None in that case; use the transpose path).
    """
    n = width * height * spp
    pixels_per_tile = max(tile_rays // spp, 1)
    shape = _pick_tile_shape(width, height, pixels_per_tile)
    exact = shape is not None
    if not exact:
        # fall back to a padded, squarish power-of-two tile
        tw = 2 ** int(np.floor(np.log2(max(8, int(np.sqrt(pixels_per_tile))))))
        tw = min(tw, pixels_per_tile)
        th = pixels_per_tile // tw
    else:
        tw, th = shape
    gx = -(-width // tw)
    gy = -(-height // th)

    ty, tx = np.mgrid[0:gy, 0:gx]
    py, px = np.mgrid[0:th, 0:tw]
    s = np.arange(spp)
    x = np.broadcast_to(tx[:, :, None, None, None] * tw +
                        px[None, None, :, :, None], (gy, gx, th, tw, spp)).reshape(-1)
    y = np.broadcast_to(ty[:, :, None, None, None] * th +
                        py[None, None, :, :, None], (gy, gx, th, tw, spp)).reshape(-1)
    ss = np.broadcast_to(s[None, None, None, None, :],
                         (gy, gx, th, tw, spp)).reshape(-1)
    valid = (x < width) & (y < height)
    ids = np.where(valid, (y * width + x) * spp + ss, n).astype(np.int32)
    x = np.where(valid, x, 0).astype(np.int32)
    y = np.where(valid, y, 0).astype(np.int32)
    if exact:
        inv = None
    else:
        inv = np.empty(n, dtype=np.int32)
        inv[ids[valid]] = np.nonzero(valid)[0].astype(np.int32)
    return ids, x, y, inv, (gy, gx, th, tw)


def _tile_coords(cfg: RenderConfig, geom, n_slots: int = 0, slot=None):
    """Arithmetic (in-jit) slot -> (ray_id, x, y) for the tile order of
    _tile_order, from a broadcasted iota (or an explicit slot array — the
    sharded path passes each device's slot range).

    The numpy arrays _tile_order builds would be baked into the jit as HLO
    literal constants — 3 x 14.7 MB at 1280x720x4spp, which the remote TPU
    runtime ships with EVERY execution (~29 ms/frame measured, dwarfing the
    small scene's 4 ms trace). Index arithmetic on an iota costs ~nothing and
    keeps the executable constant-free. Out-of-range slots (>= the grid's
    slot count) decompose to out-of-image pixels and map to the padding id
    cfg.num_primary_rays."""
    gy, gx, th, tw = geom
    spp = cfg.spp
    if slot is None:
        slot = jax.lax.iota(jnp.int32, n_slots)
    s = slot % spp
    r = slot // spp
    px = r % tw
    r = r // tw
    py = r % th
    r = r // th
    tx = r % gx
    ty = r // gx
    x = tx * tw + px
    y = ty * th + py
    valid = (x < cfg.width) & (y < cfg.height)
    ids = jnp.where(valid, (y * cfg.width + x) * spp + s,
                    cfg.num_primary_rays)
    zero = jnp.int32(0)
    return (ids, jnp.where(valid, x, zero).astype(jnp.float32),
            jnp.where(valid, y, zero).astype(jnp.float32))


def _slot_of_id(cfg: RenderConfig, geom):
    """Arithmetic inverse of _tile_coords for the padded/inexact grid: the
    kernel slot holding each true ray id (used to unpermute without a baked
    constant table)."""
    gy, gx, th, tw = geom
    spp = cfg.spp
    rid = jax.lax.iota(jnp.int32, cfg.num_primary_rays)
    s = rid % spp
    pix = rid // spp
    x = pix % cfg.width
    y = pix // cfg.width
    return ((((y // th) * gx + (x // tw)) * th + y % th) * tw
            + x % tw) * spp + s


def auto_sync_every(sphere_count: int, respawn: bool = False,
                    steps_hint: int = 0) -> int:
    """Measured sync_every optimum, shared by every megakernel caller
    (single-chip, topology, and sharded paths must agree — a diverging
    heuristic silently changes the schedule under shard_map).

    Respawn lanes desynchronize by design, so the tile-exit check only
    fires near the end of a tile's sample budget. Skipping checks trades
    up to sync_every-1 OVERSHOOT steps per tile (each a full sphere sweep)
    for fewer vector->scalar stalls, so the optimum grows with the tile's
    total step budget (`steps_hint` ~ spp * (max_bounces + 1)) and shrinks
    with sweep cost. Measured 2026-08-20 (sync 4/8/16 sustained): at the
    250 spp / 50 bounce workload small 3530/3629/3654 and medium
    752/758/759 mrays/s (16 best: +3.5%/+0.9%) but large 127.5/127.5/125.7
    (16 loses 1.4% — 512-row overshoot sweeps); at 4 spp / 10 bounces
    (~44-step tiles) sync=16 LOSES 18% on medium (403 vs 491 — the
    overshoot is a third of the tile's whole budget) -> 16 only for cheap
    sweeps (<= 64 rows) on long-running tiles (>= 512 steps), else the
    round-3 optimum 4. For the one-shot / wavefront kernels the
    vector->scalar alive reduction (~1 us) only dominates when the sphere
    sweep is cheap (small scenes)."""
    if respawn:
        return 16 if (sphere_count <= 64 and steps_hint >= 512) else 4
    return 1 if sphere_count > 128 else 3


def prepare_trimmed(spheres_soa: SphereSOA, unroll: int, cull: str,
                    n_real: Optional[int]):
    """Morton-sort + placeholder-trim the SoA and resolve the auto unroll.

    Returns (PreparedSpheres, unroll). Shared by the single-chip and
    shard_map pipelines (the trim is replicated scene prep, never
    sharded)."""
    if cull != "none":
        import dataclasses as _dc
        valid = spheres_soa.radius != 0.0
        perm = culling.morton_order(spheres_soa.center_x,
                                    spheres_soa.center_y,
                                    spheres_soa.center_z, valid)
        granule = max(unroll, 8)
        keep = (_keep_count(n_real, perm.shape[0], granule)
                if n_real is not None else
                max(-(-perm.shape[0] // granule) * granule, granule))
        if unroll <= 0:
            # Measured sweet spots (2026-08-18): full unroll up to 64 rows,
            # half the row count above — capped at 256 (the giant scene's
            # 4096 rows would otherwise unroll 2048-wide and explode Mosaic
            # compile time for no ILP the VPU can still use).
            unroll = keep if keep <= 64 else min(keep // 2, 256)
        idx = perm[:keep]
        spheres_soa = _dc.replace(spheres_soa, **{
            f.name: jnp.take(getattr(spheres_soa, f.name), idx)
            for f in _dc.fields(spheres_soa)})

    spheres = prepare(spheres_soa)
    if unroll <= 0:  # cull == "none" path (no row trimming happened)
        count = spheres.count
        if count <= 64:
            unroll = count
        else:  # largest divisor of count that is <= min(count // 2, 256)
            cap = min(count // 2, 256)
            unroll = next(d for d in range(cap, 0, -1) if count % d == 0)
    return spheres, unroll


def _keep_count(n_real: int, n_padded: int, granule: int) -> int:
    """Power-of-two row count to keep after sorting (>= granule): odd counts
    like 496 compile an order of magnitude slower in Mosaic and run worse
    than the next power of two."""
    keep = granule
    while keep < n_real:
        keep *= 2
    keep = min(keep, n_padded)
    return max(-(-keep // granule) * granule, granule)


def render_image_pallas(spheres_soa: SphereSOA, camera: Camera,
                        cfg: RenderConfig, tile_rays: int = 2048,
                        unroll: int = 0, cull: str = "sort_trim",
                        n_real: Optional[int] = None,
                        wavefront: Optional[Tuple[int, ...]] = None,
                        sync_every: int = 0,
                        respawn: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """Render a linear-radiance float image via the Pallas megakernel.

    Matches render_image() (same RNG lattice per ray id; albedo quantized to
    8 bits inside the kernel — see megakernel._pack_spheres).

    cull modes (device-side precompute in kernels/culling.py, traced into the
    render jit; neither changes the image — sorting and dropping placeholder
    rows cannot change the closest hit):
      "sort_trim" (default): Morton-sort spheres and, when `n_real` (the
        count of real spheres, e.g. builders.Scene.n_real) is given, drop
        placeholder padding down to the next power of two (small scene:
        128 -> 8 rows). n_real must be static — it determines kernel shapes.
      "none": feed spheres as-is.
    (An in-kernel chunk-bounds skip mode was measured out on both the 512-row
    large and 4096-row giant scenes and removed — megakernel._make_intersect
    docstring, tools/culling_probe.py, records/culling.txt.)

    wavefront: None for the one-shot megakernel, or a tuple of per-phase
    bounce budgets (e.g. (2, 3, 6)) to trace in compacted phases — live rays
    are argsort-packed into the leading tiles between phases so dead tiles
    exit before their first sphere sweep (see megakernel.
    trace_pallas_wavefront). Identical image either way.

    unroll: sphere-loop unroll factor; 0 = auto (v5e sweet spots measured
    2026-08-18: full unroll up to 64 rows, half the row count above).

    sync_every: bounces per early-exit check inside the kernel (skipping
    checks trades a possible overshoot bounce for fewer vector->scalar
    stalls; overshooting past the last live bounce is semantically free).
    0 = auto by sphere count.

    respawn: use the persistent-lane sample-respawn megakernel (one LANE per
    PIXEL, all spp samples traced serially per lane with in-register
    regeneration — megakernel._respawn_kernel). Retires every ray the moment
    it dies, so it wins exactly where dead-lane waste grows: deep bounce
    budgets and high spp (the reference's own 250 spp / 50 bounce profile).
    Per-ray math is bit-identical; pixel values differ from the other engines
    only in sample-sum addition order. Mutually exclusive with wavefront."""
    assert cull in ("sort_trim", "none"), cull
    assert not (respawn and wavefront is not None), \
        "respawn and wavefront are alternative scheduling strategies"
    return _render_jit(spheres_soa, camera, cfg, tile_rays, unroll,
                       cull, n_real, wavefront, sync_every, respawn)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_rays", "unroll", "cull",
                                    "n_real", "wavefront",
                                    "sync_every", "respawn"))
def _render_jit(spheres_soa: SphereSOA, camera: Camera, cfg: RenderConfig,
                tile_rays: int, unroll: int, cull: str,
                n_real: Optional[int],
                wavefront: Optional[Tuple[int, ...]] = None,
                sync_every: int = 0, respawn: bool = False
                ) -> Tuple[jax.Array, jax.Array]:
    spheres, unroll = prepare_trimmed(spheres_soa, unroll, cull, n_real)
    n = cfg.num_primary_rays
    if sync_every <= 0:
        sync_every = auto_sync_every(
            spheres.count, respawn,
            steps_hint=cfg.spp * (cfg.max_bounces + 1))

    if respawn:
        # Pixel-tile order with ONE LANE PER PIXEL: the respawn kernel owns
        # the sample loop, so the slot stream enumerates pixels, not rays.
        cfgp = cfg.replace(spp=1)
        ids_np, _, _, inv_np, geom = _tile_order(cfg.width, cfg.height, 1,
                                                 tile_rays)
        pid, x, y = _tile_coords(cfgp, geom, len(ids_np))
        (rr, rg, rb), num_rays = trace_pallas_respawn(
            spheres, camera, pid, x, y, cfg, tile_lanes=tile_rays,
            unroll=unroll, sync_every=sync_every)
        gy, gx, th, tw = geom

        def unpermute_pix(a):
            if inv_np is None:
                return a.reshape(gy, gx, th, tw).transpose(
                    0, 2, 1, 3).reshape(cfg.height, cfg.width)
            return jnp.take(a, _slot_of_id(cfgp, geom)).reshape(
                cfg.height, cfg.width)

        rad = jnp.stack([unpermute_pix(rr), unpermute_pix(rg),
                         unpermute_pix(rb)], axis=-1)
        return rad * jnp.float32(1.0 / cfg.spp), num_rays

    ids_np, _, _, inv_np, (gy, gx, th, tw) = _tile_order(
        cfg.width, cfg.height, cfg.spp, tile_rays)
    ray_id, x, y = _tile_coords(cfg, (gy, gx, th, tw), len(ids_np))

    seed = jnp.uint32(cfg.seed)
    ju, jv = rng_mod.pixel_jitter(seed, ray_id)
    s = (x + ju) * jnp.float32(1.0 / cfg.width)
    t = (y + jv) * jnp.float32(1.0 / cfg.height)
    ox, oy, oz, dx, dy, dz = camera.generate_rays(s, t, seed, ray_id)

    if wavefront is not None:
        (rr, rg, rb), num_rays = trace_pallas_wavefront(
            spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg,
            tile_rays=tile_rays, unroll=unroll, schedule=wavefront)
    else:
        (rr, rg, rb), num_rays = trace_pallas(spheres, ox, oy, oz, dx, dy,
                                              dz, ray_id, cfg,
                                              tile_rays=tile_rays,
                                              unroll=unroll,
                                              sync_every=sync_every)

    def unpermute(a):
        if inv_np is None:
            # (gy, gx, th, tw, spp) -> (gy, th, gx, tw, spp) == (H, W, spp)
            return a.reshape(gy, gx, th, tw, cfg.spp).transpose(
                0, 2, 1, 3, 4).reshape(cfg.height, cfg.width, cfg.spp)
        inv = _slot_of_id(cfg, (gy, gx, th, tw))
        return jnp.take(a, inv).reshape(cfg.height, cfg.width, cfg.spp)

    rad = jnp.stack([unpermute(rr), unpermute(rg), unpermute(rb)], axis=-1)
    image = rad.mean(axis=2)
    return image, num_rays


def slot_layout(cfg: RenderConfig, tile_rays: int = 2048):
    """(n_slots, geom, exact) for the megakernel's pixel-tile slot order —
    lets a caller (the fused backward, grad/mega.py) rebuild per-slot
    ray ids / film coordinates and the slot<->ray permutation without
    re-deriving the tiling."""
    ids_np, _, _, inv_np, geom = _tile_order(cfg.width, cfg.height, cfg.spp,
                                             tile_rays)
    return len(ids_np), geom, inv_np is None


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_rays", "unroll",
                                    "sync_every", "interpret", "slots"))
def render_image_pallas_topology(spheres_soa: SphereSOA, camera: Camera,
                                 cfg: RenderConfig, tile_rays: int = 2048,
                                 unroll: int = 0, sync_every: int = 0,
                                 interpret: bool = False,
                                 slots: bool = False):
    """Megakernel forward that ALSO returns the per-bounce hit topology.

    Returns (image f32[H, W, 3], num_rays uint32,
    topology int32[max_bounces+1, num_primary_rays] in RAY-ID order — each
    bounce's winning sphere row for live hit lanes, -1 otherwise). This is
    the forward half of the megakernel-forward gradient path (grad/mega.py):
    the fused kernel does all the intersection work once, the differentiable
    replay (render_image(topology=...)) rebuilds the autodiff graph from the
    indices without any sweep.

    cull="none" BY DESIGN: topology indices must be raw SoA row indices so
    replay cotangents land on the right rows — pass tightly padded scenes
    (builders' pad_multiple=8) rather than relying on sort_trim.

    slots=True returns the topology in kernel SLOT order,
    int32[max_bounces+1, n_slots] (n_slots from slot_layout) — the layout
    the fused Pallas backward consumes directly, skipping the slot->ray
    unpermute here and the ray->slot re-permute there."""
    spheres, unroll = prepare_trimmed(spheres_soa, unroll, "none", None)
    if sync_every <= 0:
        sync_every = auto_sync_every(spheres.count)
    n = cfg.num_primary_rays
    nb1 = cfg.max_bounces + 1

    ids_np, _, _, inv_np, (gy, gx, th, tw) = _tile_order(
        cfg.width, cfg.height, cfg.spp, tile_rays)
    ray_id, x, y = _tile_coords(cfg, (gy, gx, th, tw), len(ids_np))

    seed = jnp.uint32(cfg.seed)
    ju, jv = rng_mod.pixel_jitter(seed, ray_id)
    s = (x + ju) * jnp.float32(1.0 / cfg.width)
    t = (y + jv) * jnp.float32(1.0 / cfg.height)
    ox, oy, oz, dx, dy, dz = camera.generate_rays(s, t, seed, ray_id)

    (rr, rg, rb), num_rays, topo = trace_pallas(
        spheres, ox, oy, oz, dx, dy, dz, ray_id, cfg, tile_rays=tile_rays,
        unroll=unroll, sync_every=sync_every,
        interpret=interpret, emit_topology=True)

    def unpermute(a):
        if inv_np is None:
            return a.reshape(gy, gx, th, tw, cfg.spp).transpose(
                0, 2, 1, 3, 4).reshape(cfg.height, cfg.width, cfg.spp)
        inv = _slot_of_id(cfg, (gy, gx, th, tw))
        return jnp.take(a, inv).reshape(cfg.height, cfg.width, cfg.spp)

    rad = jnp.stack([unpermute(rr), unpermute(rg), unpermute(rb)], axis=-1)
    image = rad.mean(axis=2)

    if slots:
        return image, num_rays, topo

    if inv_np is None:
        topo_ray = topo.reshape(nb1, gy, gx, th, tw, cfg.spp).transpose(
            0, 1, 3, 2, 4, 5).reshape(nb1, -1)[:, :n]
    else:
        inv = _slot_of_id(cfg, (gy, gx, th, tw))
        topo_ray = jnp.take(topo, inv, axis=1)
    return image, num_rays, topo_ray
