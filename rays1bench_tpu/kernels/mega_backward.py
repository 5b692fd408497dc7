"""Fused Pallas backward: the whole gradient bounce chain in one kernel.

The megakernel-forward gradient path (grad/mega.py) replays the bounce chain
from recorded hit topology with jax.vjp over XLA — measured 138.5 ms per
full-resolution gradient step vs a 12.4 ms forward (PARITY.md): the O(N)
differentiable chain costs ~30 N-sized HBM round trips per bounce per
direction, and THAT — not the intersection sweeps — is the bottleneck. This
kernel fuses the entire replay, forward AND reverse, into one Pallas
dispatch per ray tile:

* forward pass: re-advance the per-lane wavefront state (origin, direction,
  attenuation, alive) from the recorded topology — the winning sphere's
  columns come from an S-select sweep over the exact SMEM sphere matrix (no
  8-bit packing: gradients are float-exact) — checkpointing each bounce's
  11 state planes into VMEM scratch (max_bounces+1 x 11 x tile, ~0.9 MB);
* reverse pass: walk the bounces backward; each step rebuilds the bounce's
  differentiable math (hit record -> scatter -> attenuation/radiance update,
  the very same jnp code as render/intersect.hit_record_from_index +
  render/integrator._bounce_step, traced HERE via jax.vjp so the transpose
  is generated, not hand-derived) and pulls the radiance cotangent through
  it. Per-sphere parameter cotangents are deposited into per-lane one-hot
  accumulator planes (grad rows x spheres) that live in kernel scratch
  ACROSS the serial TPU grid — no per-tile reduction, no HBM traffic; the
  last grid step collapses them into the (10, S) output block;
* per-tile early exit both ways: the forward while-loop stops at the last
  live bounce (sky tiles store one bounce), and the reverse fori-loop runs
  exactly that many steps.

The kernel returns the primary-ray cotangents (d loss / d origin,
d loss / d direction per lane) so the caller closes the camera gradient with
an O(N) XLA raygen VJP, plus the (10, S) sphere-column cotangent matrix in
PreparedSpheres order (center_xyz, radius_sq, inv_radius, albedo_xyz, fuzz,
ref_idx); grad/mega.py chains radius_sq/inv_radius back onto the signed
radius leaf analytically.

Gradient semantics are IDENTICAL to the replay path: the derivative of the
fixed-topology replay render (SURVEY.md §7.3 reparameterization), now with
exact (unquantized) albedos on both sides of the chain. With
cfg.soft_silhouette the replayed bounce is the detached two-branch
soft-silhouette estimator at the recorded PROMOTED topology (see
_bounce_core) — silhouette gradients run fused too. Reference for the
replayed math: src/latest/rayweek1.cpp:152-339 (hit), :396-512 (scatter),
:515-536 (radiance) — done twice here, forward and reverse.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.core.vecmath import safe_sqrt
from rays1bench_tpu.render.integrator import sky_color
from rays1bench_tpu.render.intersect import HitRecord
from rays1bench_tpu.render.materials import scatter
from rays1bench_tpu.scene.spheres import PreparedSpheres

LANES = 128

# Rows of the gradient output matrix, in PreparedSpheres column order.
GRAD_ROWS = ("center_x", "center_y", "center_z", "radius_sq", "inv_radius",
             "albedo_x", "albedo_y", "albedo_z", "fuzz", "ref_idx")
NUM_GRAD = len(GRAD_ROWS)

# Sphere SMEM layout: the 10 gradient columns + mat_type as f32 (exact for
# codes 0..2).
_NUM_COLS = NUM_GRAD + 1

# Strategy switch: at <= MAX_UNROLLED rows the kernel unrolls the column
# lookup and keeps NUM_GRAD * S per-lane (sub, LANES) accumulator planes in
# VMEM (round-4 design — the production path for the small/medium scenes).
# Above it, the round-5 BLOCKED path takes over: dynamic-index fori loops
# bound the trace size, the reverse pass reuses column values checkpointed
# by the forward, and cotangents deposit into sublane-packed accumulators —
# (NUM_GRAD * S/8) blocks of (8, LANES), sphere row s living on sublane s%8
# of block s//8 — so accumulator VMEM is S * 5 KB instead of S * sub * 0.5
# KB and the LARGE scene's 512 rows fit (VERDICT r4 item 1). MAX_SPHERES is
# the blocked path's cap (SMEM + accumulator budget), not a design wall.
# Threshold measured (medium scene, 48 rows, 1280x720 @ 4 spp, v5e,
# 2026-08-21): blocked 86.6 ms vs unrolled 79.5 ms steady-state — the
# unrolled kernel keeps ~9% at <= 64 rows (its static selects beat the
# fori-loop's trip overhead at small S), so 64 stays the crossover.
MAX_UNROLLED = 64
MAX_SPHERES = 1024
_VMEM_BUDGET = 12 * 2**20


def _vmem_estimate(s_count: int, max_bounces: int, sub: int) -> int:
    """Bytes of VMEM scratch the blocked kernel needs resident (accumulator
    blocks + per-bounce state and column checkpoints)."""
    acc = NUM_GRAD * (s_count // 8) * 8 * LANES
    st = 10 * (max_bounces + 2) * sub * LANES
    cols = _NUM_COLS * (max_bounces + 1) * sub * LANES
    return 4 * (acc + st + cols)


def fused_supported(s_count: int, cfg, tile_rays: int = 2048) -> bool:
    """Can backward_pallas take this scene/config? (row cap, 8-row block
    alignment above MAX_UNROLLED, and the blocked path's VMEM budget.)
    grad/inverse._pick_engine consults this so engine="auto" never routes
    to a configuration the kernel would reject."""
    if s_count > MAX_SPHERES:
        return False
    if s_count <= MAX_UNROLLED:
        return True
    return (s_count % 8 == 0
            and _vmem_estimate(s_count, cfg.max_bounces,
                               tile_rays // LANES) < _VMEM_BUDGET)


def _pack_exact(prep: PreparedSpheres) -> jax.Array:
    """(11, S) f32 exact sphere matrix (no quantization — this is the
    gradient path; megakernel._pack_spheres' 8-bit albedo trick is a
    primal-only optimization)."""
    return jnp.stack([
        prep.center_x, prep.center_y, prep.center_z, prep.radius_sq,
        prep.inv_radius, prep.albedo_x, prep.albedo_y, prep.albedo_z,
        prep.fuzz, prep.ref_idx, prep.mat_type.astype(jnp.float32),
    ])


def _bounce_core(o, d, a, cols, mt, hit, alive, cont, b, ray_id, seed_c,
                 t_min, max_bounces, soft_eps: float = 0.0):
    """One differentiable replay bounce on per-lane values.

    Mirrors render/intersect.hit_record_from_index's O(N) chain plus
    render/integrator._bounce_step's state update, with the per-lane sphere
    columns `cols` (10 planes) as the differentiable leaves. `cont=None`
    computes the continue mask (forward pass); the backward passes the
    recorded one so the vjp'd closure has no boolean outputs.

    soft_eps > 0: the detached two-branch soft-silhouette estimator at the
    recorded (already-promoted) topology — the same promote=False replay
    semantics as integrator.trace: cover and the far exit rebuild
    differentiably from the chosen sphere's columns, the branch draw
    recomputes from the stateless RNG, and the branch weights carry the
    score term cover/sg(cover) whose derivative is the silhouette-motion
    gradient.

    Returns (o', d', a', radd, cont).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    ar, ag, ab = a
    cx, cy, cz, rsq, ivr, alx, aly, alz, fz, ri = cols

    # Hit record from the chosen sphere (intersect.py:260-306).
    gx, gy, gz = cx - ox, cy - oy, cz - oz
    nb = gx * dx + gy * dy + gz * dz
    c = gx * gx + gy * gy + gz * gz - rsq
    sq = safe_sqrt(nb * nb - c)
    t1 = nb - sq
    t = jnp.where(t1 > t_min, t1, nb + sq)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = (px - cx) * ivr
    ny = (py - cy) * ivr
    nz = (pz - cz) * ivr
    cover = None
    px2 = py2 = pz2 = None
    if soft_eps:
        # intersect.hit_record_from_index's soft chain: world-unit edge
        # coordinate, sigmoid cover, far-exit resume point, renormalized
        # near-miss normals.
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                            1e-20))
        nx, ny, nz = nx * inv_len, ny * inv_len, nz * inv_len
        b_imp = jnp.sqrt(jnp.maximum(c + rsq - nb * nb, 1e-20))
        edge = jnp.sqrt(jnp.maximum(rsq, 0.0)) - b_imp
        cover = jax.nn.sigmoid(edge * jnp.float32(1.0 / soft_eps))
        t2 = nb + sq
        px2 = ox + t2 * dx
        py2 = oy + t2 * dy
        pz2 = oz + t2 * dz
    rec = HitRecord(hit=hit, t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
                    mat_type=mt, albedo_x=alx, albedo_y=aly, albedo_z=alz,
                    fuzz=fz, ref_idx=ri)

    (sx, sy, sz), (mr, mg, mb), ok = scatter(dx, dy, dz, rec, seed_c,
                                             ray_id, b)
    hx, hy, hz = px, py, pz
    if soft_eps:
        # Detached two-branch estimator (integrator._bounce_step).
        from rays1bench_tpu.core import rng as rng_mod
        sg = jax.lax.stop_gradient
        u = rng_mod.uniform01(seed_c, ray_id, b,
                              rng_mod.Slots.SILHOUETTE_P)
        cov_sg = sg(cover)
        take = u < cov_sg
        w_b = cover / jnp.maximum(cov_sg, 1e-20)
        w_t = (1.0 - cover) / jnp.maximum(1.0 - cov_sg, 1e-20)
        sx = jnp.where(take, sx, dx)
        sy = jnp.where(take, sy, dy)
        sz = jnp.where(take, sz, dz)
        mr = jnp.where(take, mr * w_b, w_t)
        mg = jnp.where(take, mg * w_b, w_t)
        mb = jnp.where(take, mb * w_b, w_t)
        ok = (take & ok) | ~take
        hx = jnp.where(take, hx, px2)
        hy = jnp.where(take, hy, py2)
        hz = jnp.where(take, hz, pz2)

    skr, skg, skb = sky_color(dx, dy, dz)
    miss = alive & ~hit
    radd = (jnp.where(miss, ar * skr, 0.0),
            jnp.where(miss, ag * skg, 0.0),
            jnp.where(miss, ab * skb, 0.0))

    if cont is None:
        cont = alive & hit & ok & (b < max_bounces)
    o2 = (jnp.where(cont, hx, ox), jnp.where(cont, hy, oy),
          jnp.where(cont, hz, oz))
    d2 = (jnp.where(cont, sx, dx), jnp.where(cont, sy, dy),
          jnp.where(cont, sz, dz))
    a2 = (jnp.where(cont, ar * mr, ar), jnp.where(cont, ag * mg, ag),
          jnp.where(cont, ab * mb, ab))
    return o2, d2, a2, radd, cont


def _bwd_kernel(spheres_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                rid_ref, ctr_ref, ctg_ref, ctb_ref, topo_ref,
                grads_ref, cox_ref, coy_ref, coz_ref,
                cdx_ref, cdy_ref, cdz_ref, acc_ref, *,
                num_spheres: int, max_bounces: int, t_min: float, seed: int,
                n_rays: int, sub: int, soft_eps: float = 0.0,
                s_pad: int = LANES):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    zero = jnp.zeros((sub, LANES), jnp.float32)
    seed_c = np.uint32(seed)
    tmin_c = np.float32(t_min)
    ray_id = rid_ref[...]
    ct_r = (ctr_ref[...], ctg_ref[...], ctb_ref[...])
    blocked = num_spheres > MAX_UNROLLED
    sb_count = num_spheres // 8  # blocked path only (S % 8 asserted)

    # The one-hot gradient accumulators persist across the serial grid; zero
    # them once.
    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def lookup(j):
        """Winning sphere's columns per lane: an S-select sweep over SMEM
        (the take_cols dense-sweep design, intersect.py:49-57; dead lanes'
        j = -1 resolves to column 0, masked by hit everywhere). Fully
        unrolled at <= MAX_UNROLLED rows; above, a fori_loop with a
        group-of-8 body keeps the Mosaic program size S-independent (the
        compile-time wall, not the VPU, is what forbids unrolling 512
        rows x 11 columns)."""
        jc = jnp.maximum(j, 0)
        if not blocked:
            cols = []
            for cidx in range(_NUM_COLS):
                v = zero + spheres_smem[cidx, 0]
                for s in range(1, num_spheres):
                    v = jnp.where(jc == s, spheres_smem[cidx, s], v)
                cols.append(v)
            return cols

        def group(g, carry):
            for k in range(8):
                s = g * 8 + k
                m = jc == s
                carry = tuple(
                    jnp.where(m, zero + spheres_smem[c, s], carry[c])
                    for c in range(_NUM_COLS))
            return carry

        # Sweeping s = 0 with zero-init matches the unrolled path's
        # column-0 init: jc == 0 always selects row 0's values first.
        init = tuple(zero for _ in range(_NUM_COLS))
        return list(jax.lax.fori_loop(0, sb_count, group, init))

    def run(st, ct, cols_st):
        # st: 11 refs of (max_bounces+2, sub, LANES) — per-bounce
        # checkpoints of (o3, d3, a3, alive) + alive at b+1 (= bounce b's
        # cont, read back in reverse); ct: (9, sub, LANES) cotangent planes.
        def read_state(b):
            o = tuple(st[k][pl.ds(b, 1)][0] for k in range(3))
            d = tuple(st[k][pl.ds(b, 1)][0] for k in range(3, 6))
            a = tuple(st[k][pl.ds(b, 1)][0] for k in range(6, 9))
            alive = st[9][pl.ds(b, 1)][0] > 0.0
            return o, d, a, alive

        def write_state(b, o, d, a, alive):
            for k, v in enumerate(o + d + a):
                st[k][pl.ds(b, 1)] = v[None]
            st[9][pl.ds(b, 1)] = alive.astype(jnp.float32)[None]

        # ---- forward replay: advance + checkpoint ----------------------- #
        alive0 = ray_id < n_rays
        one = zero + 1.0
        write_state(0, (ox_ref[...], oy_ref[...], oz_ref[...]),
                    (dx_ref[...], dy_ref[...], dz_ref[...]),
                    (one, one, one), alive0)

        def fwd_body(carry):
            b, _ = carry
            o, d, a, alive = read_state(b)
            j = topo_ref[pl.ds(b, 1)][0]
            hit = j >= 0
            cols = lookup(j)
            if blocked:
                # Checkpoint the looked-up columns so the reverse pass reads
                # them back instead of paying a second S-row sweep.
                for c in range(_NUM_COLS):
                    cols_st[c][pl.ds(b, 1)] = cols[c][None]
            mt = cols[NUM_GRAD].astype(jnp.int32)
            o2, d2, a2, _, cont = _bounce_core(
                o, d, a, tuple(cols[:NUM_GRAD]), mt, hit, alive, None, b,
                ray_id, seed_c, tmin_c, max_bounces, soft_eps=soft_eps)
            write_state(b + 1, o2, d2, a2, cont)
            return (b + 1, jnp.max(jnp.where(cont, 1, 0)))

        b_end, _ = jax.lax.while_loop(
            lambda cr: (cr[0] <= max_bounces) & (cr[1] > 0), fwd_body,
            (jnp.int32(0), jnp.max(jnp.where(alive0, 1, 0))))

        # ---- reverse pass ----------------------------------------------- #
        for k in range(9):
            ct[k] = zero

        def bwd_body(k, _):
            b = b_end - 1 - k
            o, d, a, alive = read_state(b)
            _, _, _, cont = read_state(b + 1)  # alive at b+1 == bounce b cont
            cont = cont  # bool plane
            j = topo_ref[pl.ds(b, 1)][0]
            hit = j >= 0
            if blocked:
                cols = [cols_st[c][pl.ds(b, 1)][0]
                        for c in range(_NUM_COLS)]
            else:
                cols = lookup(j)
            mt = cols[NUM_GRAD].astype(jnp.int32)

            def f(*leaves):
                o_ = leaves[0:3]
                d_ = leaves[3:6]
                a_ = leaves[6:9]
                cols_ = leaves[9:9 + NUM_GRAD]
                o2, d2, a2, radd, _ = _bounce_core(
                    o_, d_, a_, cols_, mt, hit, alive, cont, b, ray_id,
                    seed_c, tmin_c, max_bounces, soft_eps=soft_eps)
                return o2 + d2 + a2 + radd

            primals = o + d + a + tuple(cols[:NUM_GRAD])
            _, vjp = jax.vjp(f, *primals)
            cts = vjp(tuple(ct[k2] for k2 in range(9)) + ct_r)
            for k2 in range(9):
                ct[k2] = cts[k2]
            # Deposit the 10 per-lane column cotangents onto their sphere
            # rows (one-hot; masks shared across the 10 rows).
            if not blocked:
                masks = [j == s for s in range(num_spheres)]
                for g in range(NUM_GRAD):
                    cg = cts[9 + g]
                    for s in range(num_spheres):
                        idx = g * num_spheres + s
                        acc_ref[idx] = acc_ref[idx] + jnp.where(masks[s], cg,
                                                                zero)
                return 0

            # Blocked deposit: 8 sphere rows per accumulator block, row
            # s on sublane s % 8 of block s // 8, lanes still per-ray —
            # the sublane reduction happens HERE (8 rays-to-1 per deposit)
            # so accumulator VMEM stays S-proportional, not S x sub.
            def dep_body(sb, _):
                base = sb * 8
                masks = [j == base + k for k in range(8)]
                for g in range(NUM_GRAD):
                    cg = cts[9 + g]
                    upd = jnp.concatenate(
                        [jnp.sum(jnp.where(masks[k], cg, zero), axis=0,
                                 keepdims=True) for k in range(8)], axis=0)
                    idx = g * sb_count + sb
                    acc_ref[pl.ds(idx, 1)] = (acc_ref[pl.ds(idx, 1)]
                                              + upd[None])
                return 0

            jax.lax.fori_loop(0, sb_count, dep_body, 0)
            return 0

        jax.lax.fori_loop(0, b_end, bwd_body, 0)

        # Primary-ray cotangents out (raygen VJP happens in XLA).
        cox_ref[...] = ct[0]
        coy_ref[...] = ct[1]
        coz_ref[...] = ct[2]
        cdx_ref[...] = ct[3]
        cdy_ref[...] = ct[4]
        cdz_ref[...] = ct[5]

    nb2 = max_bounces + 2
    nb1 = max_bounces + 1
    cols_scope = ([pltpu.VMEM((nb1, sub, LANES), jnp.float32)
                   for _ in range(_NUM_COLS)] if blocked else [])
    pl.run_scoped(
        run,
        [pltpu.VMEM((nb2, sub, LANES), jnp.float32) for _ in range(10)],
        pltpu.VMEM((9, sub, LANES), jnp.float32),
        cols_scope,
    )

    # Collapse the accumulators into the (NUM_GRAD, S_pad) output once, at
    # the last grid step.
    @pl.when(i == nt - 1)
    def _():
        if not blocked:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            for g in range(NUM_GRAD):
                row = jnp.zeros((1, LANES), jnp.float32)
                for s in range(num_spheres):
                    tot = jnp.sum(acc_ref[g * num_spheres + s])
                    row = row + jnp.where(lane == s, tot, 0.0)
                grads_ref[g:g + 1, :] = row
            return

        # Blocked: lane-reduce each (8, LANES) block to (8, 1) per-sphere
        # totals and fan them onto the (1, s_pad) output rows; all vector
        # ops, carried through one fori_loop over blocks.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)

        def col_body(sb, rows):
            base = sb * 8
            out = []
            for g in range(NUM_GRAD):
                blk = acc_ref[pl.ds(g * sb_count + sb, 1)][0]
                tot = jnp.sum(blk, axis=1, keepdims=True)  # (8, 1)
                row = rows[g]
                for k in range(8):
                    row = row + jnp.where(lane == base + k,
                                          tot[k:k + 1, :], 0.0)
                out.append(row)
            return tuple(out)

        rows = jax.lax.fori_loop(
            0, sb_count, col_body,
            tuple(jnp.zeros((1, s_pad), jnp.float32)
                  for _ in range(NUM_GRAD)))
        for g in range(NUM_GRAD):
            grads_ref[g:g + 1, :] = rows[g]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_rays", "n_rays",
                                    "interpret"))
def backward_pallas(spheres: PreparedSpheres, ox, oy, oz, dx, dy, dz, ray_id,
                    ct_r, ct_g, ct_b, topo, cfg: RenderConfig,
                    tile_rays: int = 2048, n_rays: int = 0,
                    interpret: bool = False
                    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Fused gradient of the fixed-topology replay for N primary rays.

    Inputs are in kernel SLOT order (any order; lanes with
    ray_id >= n_rays are padding): primary rays (ox..dz), per-lane radiance
    cotangents (ct_r/g/b = d loss / d per-ray linear radiance), and the
    per-bounce topology topo int32[max_bounces+1, N] (winning raw sphere row
    for live hit lanes, -1 otherwise — kernels/pipeline.py topology order).

    Returns (grads f32[NUM_GRAD, S], (ct_ox, ct_oy, ct_oz, ct_dx, ct_dy,
    ct_dz) f32[N]): per-sphere cotangents of the GRAD_ROWS columns, and the
    primary-ray cotangents for the caller's raygen VJP.
    """
    n = ox.shape[0]
    assert n % tile_rays == 0, (n, tile_rays)
    s_count = spheres.count
    assert s_count <= MAX_SPHERES, (
        f"fused backward supports <= {MAX_SPHERES} sphere rows "
        f"(got {s_count}); use the XLA replay path")
    sub = tile_rays // LANES
    num_tiles = n // tile_rays
    n_active = n_rays if n_rays > 0 else min(n, cfg.num_primary_rays)
    nb1 = cfg.max_bounces + 1
    assert topo.shape == (nb1, n), (topo.shape, nb1, n)
    blocked = s_count > MAX_UNROLLED
    if blocked:
        assert s_count % 8 == 0, s_count
        s_pad = -(-s_count // LANES) * LANES
        acc_shape = (NUM_GRAD * (s_count // 8), 8, LANES)
        # VMEM budget: accumulators + per-bounce state/column checkpoints
        # must co-reside (the column checkpoint is what spares the reverse
        # pass a second S-row sweep). ~16 MB/core on v5e; leave headroom.
        vmem = _vmem_estimate(s_count, cfg.max_bounces, sub)
        assert vmem < _VMEM_BUDGET, (
            f"fused backward VMEM estimate {vmem / 2**20:.1f} MB "
            f"(S={s_count}, max_bounces={cfg.max_bounces}); lower "
            f"max_bounces or tile_rays, or use the XLA replay path")
    else:
        s_pad = LANES
        acc_shape = (NUM_GRAD * s_count, sub, LANES)

    packed = _pack_exact(spheres)
    shape2 = (num_tiles * sub, LANES)
    as2d = lambda a: a.reshape(shape2)

    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_kernel,
        num_spheres=s_count,
        max_bounces=cfg.max_bounces,
        t_min=cfg.t_min,
        seed=cfg.seed,
        n_rays=n_active,
        sub=sub,
        soft_eps=float(cfg.soft_silhouette),
        s_pad=s_pad,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec, ray_spec, ray_spec,
            pl.BlockSpec((nb1, sub, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((NUM_GRAD, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NUM_GRAD, s_pad), jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(acc_shape, jnp.float32),
        ],
        interpret=interpret,
    )(packed, as2d(ox), as2d(oy), as2d(oz), as2d(dx), as2d(dy), as2d(dz),
      as2d(ray_id), as2d(ct_r), as2d(ct_g), as2d(ct_b),
      topo.reshape((nb1,) + shape2))

    grads = outs[0][:, :s_count]
    cts = tuple(o.reshape(n) for o in outs[1:7])
    return grads, cts
