"""Fused Pallas path-tracing megakernel.

The TPU rewrite of the reference's entire hot region — the per-ray recursion
of intersection (reference: src/latest/rayweek1.cpp:152-339), scatter
(:396-512), and radiance (:515-536) — as ONE Pallas kernel per ray tile:

* grid over tiles of T rays, each tile living in VMEM/vector registers for its
  whole path — bounce state never round-trips HBM;
* sphere SoA staged in SMEM (a few KB; the analog of the reference keeping the
  SoA resident in L1) and broadcast scalar-by-scalar into (sublane, lane)
  vector ops across the whole ray tile — the reference's 8-wide AVX2 pass
  becomes a T-wide VPU pass;
* the movemask "collect positive discriminants" compaction (rayweek1.cpp:
  205-226) is replaced by a dense running (best_t, payload) select — branchy
  compaction is exactly what the VPU cannot do, masked selection is what it
  does at full width. Payloads are packed to minimize selects per sphere:
  albedo as 3x8 bits in one float (exact in the 24-bit mantissa; the scenes'
  albedos are 8-bit-derived), material type + parameter as mt*32+param;
* per-tile early exit: the bounce loop stops when every ray in the *tile* is
  dead. Consecutive ray ids are spatially coherent (ray_id enumerates
  pixel-major), so whole tiles die together — this recovers most of the
  recursion's early-return without any work queue;
* placeholder spheres are given radius_sq = -1e30, which forces their
  discriminant negative for every ray — the masked-lane analog of the
  reference's inv_radius == 0 skip (rayweek1.cpp:291), with zero extra ops.

Scatter and RNG reuse the exact same jnp code as the XLA pipeline
(render/materials.py, core/rng.py) — Pallas traces it into the kernel, so the
megakernel matches the reference pipeline by construction (tested against it;
the albedo quantization is the one knowingly-lossy step, < 1/510 per channel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rays1bench_tpu.core import rng as rng_mod
from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.render.camera import Camera
from rays1bench_tpu.render.intersect import HitRecord
from rays1bench_tpu.render.materials import scatter
from rays1bench_tpu.render.integrator import sky_color
from rays1bench_tpu.scene.spheres import PreparedSpheres

LANES = 128
_BIG = np.float32(3.0e38)
_INF = np.float32(np.inf)

# Sphere SMEM row layout (see _pack_spheres).
_CX, _CY, _CZ, _RSQ, _INVR, _ALB, _MTP = range(7)
NUM_SPHERE_ROWS = 7


def _pack_spheres(prep: PreparedSpheres) -> jax.Array:
    """Stack the hot columns into one (7, S) f32 matrix for SMEM staging.

    - radius_sq of placeholder rows is poisoned to -1e30: their discriminant
      is negative for every possible ray, so no mask lane is ever needed.
    - albedo packs to r*65536 + g*256 + b on a 0..255 scale (exact integers
      within the f32 mantissa).
    - mat_type and its parameter (fuzz for metal / ref_idx for dielectric —
      mutually exclusive) pack as mt*32 + param (param < 32 always; ref_idx
      tops out ~24.2 in the large scene).
    """
    q = lambda v: jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0)
    alb = q(prep.albedo_x) * 65536.0 + q(prep.albedo_y) * 256.0 + q(prep.albedo_z)
    param = jnp.where(prep.mat_type == 2, prep.ref_idx, prep.fuzz)
    return jnp.stack([
        prep.center_x,
        prep.center_y,
        prep.center_z,
        jnp.where(prep.valid > 0.0, prep.radius_sq, -1e30),
        prep.inv_radius,
        alb,
        prep.mat_type.astype(jnp.float32) * 32.0 + param,
    ])


def _pack_camera(camera) -> jax.Array:
    """Flatten the Camera pytree into one (1, 19) f32 row for SMEM staging:
    origin(3), lower_left(3), horizontal(3), vertical(3), u(3), v(3),
    lens_radius(1). Consumed by _cam_from_smem."""
    return jnp.concatenate([
        camera.origin, camera.lower_left, camera.horizontal, camera.vertical,
        camera.u, camera.v, camera.lens_radius.reshape(1),
    ]).reshape(1, 19)


def _cam_from_smem(cam_smem):
    """Rebuild a Camera-shaped view over SMEM scalars. generate_rays only
    indexes its fields with [i], so tuples of SMEM scalar reads duck-type the
    Camera dataclass exactly — the raygen math traced into the kernel is the
    very same jnp code the XLA pipeline runs (render/camera.py:71-90)."""
    import types
    g = lambda i: cam_smem[0, i]
    return types.SimpleNamespace(
        origin=(g(0), g(1), g(2)), lower_left=(g(3), g(4), g(5)),
        horizontal=(g(6), g(7), g(8)), vertical=(g(9), g(10), g(11)),
        u=(g(12), g(13), g(14)), v=(g(15), g(16), g(17)),
        lens_radius=g(18))


def _make_intersect(spheres_smem, *, num_spheres: int,
                    t_min: float, sub: int, unroll: int,
                    carry_index: bool = False, soft_eps: float = 0.0):
    """Build the closest-hit sweep closure over the sphere SMEM refs.

    Shared by every megakernel variant (_kernel, _phase_kernel,
    _respawn_kernel). Returns isect(ox..dz) -> (best_t, cx, cy, cz, inv_r,
    albedo_packed, mat_packed[, rsq][, idx]). carry_index adds the winning
    sphere's SMEM row index as an extra f32 carry (one extra select per
    sphere) — the topology the megakernel-forward gradient path emits
    (grad/mega.py).

    soft_eps > 0 (the soft-silhouette gradient forward): the payload also
    carries radius_sq, and a SECOND sweep finds each lane's best NEAR MISS —
    the sphere with the largest (least negative) silhouette coordinate
    edge = |r| - b among spheres the ray misses (edge <= 0) whose closest
    approach nb lies in (t_min, t_hit) — the in-kernel twin of
    render/intersect._near_miss_index (same formulas, same first-wins tie
    order over the same row order with cull="none"). Grazing lanes inside
    the sigmoid band are PROMOTED: the winner payload, t (= nb, where the
    roots meet), and topology index are replaced by the grazed sphere's.
    Two passes are required because the graze test needs the FINAL t_hit;
    a running-t_hit single pass would accept grazes later invalidated by a
    nearer hit. Cost ~2x the sweep — soft mode is the silhouette-fitting
    path, not the headline renderer.

    The sweep is always DENSE over the (Morton-sorted, placeholder-trimmed)
    rows — the reference's own shape (rayweek1.cpp:190-226 tests every
    sphere every ray). A chunk-bounds culled variant was built and measured
    OUT, twice: -25% on the large scene (512 rows, round 3), and 0.83-1.00x
    on the 4096-row giant stress scene on BOTH engines (round 4,
    tools/culling_probe.py, records/culling.txt) — per-chunk scalar sync
    (vector reduce -> scf.if) costs more than the skipped sweeps, because a
    2048-lane tile's rays point everywhere after one bounce (and respawn
    lanes desynchronize besides), so the any-lane-can-hit union cull almost
    never fires. Removed; the probe and records keep the negative result."""
    zero = jnp.zeros((sub, LANES), jnp.float32)
    tmin_c = np.float32(t_min)
    ncarry = 7 + (1 if soft_eps else 0) + (1 if carry_index else 0)
    _RSQ_POS = 7  # rsq carry slot (soft mode); idx is always last

    def make_sphere_step(ox, oy, oz, dx, dy, dz):
        """Per-sphere running (best_t, payload) update, ~26 VPU ops over the
        whole ray tile. Misses (disc < 0) rely on IEEE NaN propagation:
        sqrt(negative) = NaN, every NaN comparison is false, so a missing
        sphere can never win `better` — no validity mask, no clamp, no
        poison select."""
        def one_sphere(s, carry):
            (bt, cx, cy, cz, ivr, alb, mtp) = carry[:7]
            scx = spheres_smem[_CX, s]
            scy = spheres_smem[_CY, s]
            scz = spheres_smem[_CZ, s]
            rsq = spheres_smem[_RSQ, s]

            cox = scx - ox
            coy = scy - oy
            coz = scz - oz
            nb = cox * dx + coy * dy + coz * dz
            c = cox * cox + coy * coy + coz * coz - rsq
            disc = nb * nb - c
            sq = jnp.sqrt(disc)                 # NaN on miss
            t1 = nb - sq
            t2 = nb + sq
            t = jnp.where(t1 > tmin_c, t1, t2)  # near root first (ref pass 2)
            better = (t < bt) & (t > tmin_c)    # both false on NaN
            bt = jnp.where(better, t, bt)
            cx = jnp.where(better, scx, cx)
            cy = jnp.where(better, scy, cy)
            cz = jnp.where(better, scz, cz)
            ivr = jnp.where(better, spheres_smem[_INVR, s], ivr)
            alb = jnp.where(better, spheres_smem[_ALB, s], alb)
            mtp = jnp.where(better, spheres_smem[_MTP, s], mtp)
            out = (bt, cx, cy, cz, ivr, alb, mtp)
            if soft_eps:
                out += (jnp.where(better, rsq, carry[_RSQ_POS]),)
            if carry_index:
                # Exact in f32 (sphere counts are << 2^24).
                s_f = jax.lax.convert_element_type(s, jnp.float32)
                out += (jnp.where(better, s_f, carry[ncarry - 1]),)
            return out
        return one_sphere

    def make_graze_step(ox, oy, oz, dx, dy, dz, t_hit):
        """Per-sphere running best-NEAR-MISS update (soft mode, sweep 2) —
        the in-kernel twin of render/intersect._near_miss_index: among
        spheres the ray MISSES (edge = |r| - b <= 0) with closest approach
        nb in (t_min, t_hit), keep the largest edge ('>' keeps the first
        maximum, matching jnp.argmax's tie order). The payload mirrors the
        main sweep's (edge replaces bt; nb rides in the rsq-neighbor slot
        order below) so the promotion merge is a flat select."""
        def one_graze(s, carry):
            (be, cx, cy, cz, ivr, alb, mtp, rsq_c, nb_c) = carry[:9]
            scx = spheres_smem[_CX, s]
            scy = spheres_smem[_CY, s]
            scz = spheres_smem[_CZ, s]
            rsq = spheres_smem[_RSQ, s]
            cox = scx - ox
            coy = scy - oy
            coz = scz - oz
            nb = cox * dx + coy * dy + coz * dz
            co2 = cox * cox + coy * coy + coz * coz
            # Same edge coordinate as _near_miss_index (world units).
            edge = jnp.sqrt(jnp.maximum(rsq, 0.0)) - \
                jnp.sqrt(jnp.maximum(co2 - nb * nb, 1e-20))
            # rsq > -1e29 masks the poisoned placeholder rows (the XLA
            # sweep's spheres.valid test).
            graze = ((rsq > -1e29) & (nb > tmin_c) & (edge <= 0.0)
                     & (nb < t_hit))
            better = graze & (edge > be)
            be = jnp.where(better, edge, be)
            cx = jnp.where(better, scx, cx)
            cy = jnp.where(better, scy, cy)
            cz = jnp.where(better, scz, cz)
            ivr = jnp.where(better, spheres_smem[_INVR, s], ivr)
            alb = jnp.where(better, spheres_smem[_ALB, s], alb)
            mtp = jnp.where(better, spheres_smem[_MTP, s], mtp)
            rsq_c = jnp.where(better, rsq, rsq_c)
            nb_c = jnp.where(better, nb, nb_c)
            out = (be, cx, cy, cz, ivr, alb, mtp, rsq_c, nb_c)
            if carry_index:
                s_f = jax.lax.convert_element_type(s, jnp.float32)
                out += (jnp.where(better, s_f, carry[9]),)
            return out
        return one_graze

    _INIT = lambda: (zero + _INF,) + (zero,) * (ncarry - 1)

    def intersect(ox, oy, oz, dx, dy, dz):
        """Dense sweep over all spheres.

        Manual unroll (Mosaic's fori_loop only supports unroll=1 or full):
        the group body issues `unroll` independent candidate chains, giving
        the VPU ILP across the serial running-min dependency."""
        one_sphere = make_sphere_step(ox, oy, oz, dx, dy, dz)

        def group(g, carry):
            s0 = g * unroll
            for k in range(unroll):
                carry = one_sphere(s0 + k, carry)
            return carry

        assert num_spheres % unroll == 0, (num_spheres, unroll)
        best = jax.lax.fori_loop(0, num_spheres // unroll, group, _INIT())
        if not soft_eps:
            return best

        # ---- soft mode: graze sweep + promotion merge ------------------- #
        one_graze = make_graze_step(ox, oy, oz, dx, dy, dz, best[0])
        ngr = 10 if carry_index else 9
        ginit = (zero - _INF,) + (zero,) * (ngr - 1)

        def ggroup(g, carry):
            s0 = g * unroll
            for k in range(unroll):
                carry = one_graze(s0 + k, carry)
            return carry

        gr = jax.lax.fori_loop(0, num_spheres // unroll, ggroup, ginit)
        # Promote lanes grazing inside the band — the cutoff is the ONE
        # defined next to the sigmoid it tails off (intersect._NEAR_CUT);
        # test_soft_mega_matches_pipeline pins exact decision parity.
        from rays1bench_tpu.render.intersect import _NEAR_CUT
        near = gr[0] > np.float32(-_NEAR_CUT * soft_eps)
        # best payload -> (t, cx, cy, cz, ivr, alb, mtp, rsq[, idx]);
        # graze payload -> (edge, same..., rsq, nb[, idx]). Promoted lanes
        # take t = nb (the roots meet at the closest approach as disc -> 0).
        merged = [jnp.where(near, gr[8], best[0])]
        for i in range(1, 8):
            merged.append(jnp.where(near, gr[i], best[i]))
        if carry_index:
            merged.append(jnp.where(near, gr[9], best[8]))
        return tuple(merged) + (near,)

    return intersect


def _closest_hit_record(best, ox, oy, oz, dx, dy, dz):
    """Unpack the running-min sweep's packed payload into a HitRecord
    (amortized: once per bounce, not per sphere). `best` is the isect()
    result tuple (best_t, cx, cy, cz, inv_r, albedo_packed, mat_packed); a
    trailing carry_index element, if present, is ignored here (the caller
    reads it directly)."""
    (bt, cx, cy, cz, ivr, albp, mtp) = best[:7]
    hit = bt < _BIG
    t = jnp.where(hit, bt, 1.0)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = (px - cx) * ivr
    ny = (py - cy) * ivr
    nz = (pz - cz) * ivr

    mt_f = jnp.floor(mtp * (1.0 / 32.0))
    mt_i = mt_f.astype(jnp.int32)
    mparam = mtp - mt_f * 32.0
    a_r = jnp.floor(albp * (1.0 / 65536.0))
    rem = albp - a_r * 65536.0
    a_g = jnp.floor(rem * (1.0 / 256.0))
    a_b = rem - a_g * 256.0
    inv255 = np.float32(1.0 / 255.0)

    rec = HitRecord(hit=hit, t=t, px=px, py=py, pz=pz,
                    nx=nx, ny=ny, nz=nz, mat_type=mt_i,
                    albedo_x=a_r * inv255, albedo_y=a_g * inv255,
                    albedo_z=a_b * inv255,
                    fuzz=mparam, ref_idx=jnp.where(mt_i == 2, mparam, 1.0))
    return hit, px, py, pz, rec


def _soft_hit_record(best, ox, oy, oz, dx, dy, dz, t_min: float,
                     soft_eps: float):
    """Soft-mode hit record: rebuild t/p/normal AND the soft fields (cover,
    far exit) from the merged winner payload via the exact formulas of
    render/intersect.hit_record_from_index — bitwise XLA parity in
    interpreter mode is the test contract (tests/test_megakernel.py).
    `best` is the soft isect() tuple (t, cx, cy, cz, ivr, alb, mtp, rsq
    [, idx], near); miss lanes carry the init-zeros payload, whose derived
    fields are garbage but masked by hit=False at every consumer (the XLA
    path's miss lanes read sphere 0's columns — equally masked)."""
    from rays1bench_tpu.core.vecmath import safe_sqrt
    (bt, cx, cy, cz, ivr, albp, mtp, rsq) = best[:8]
    hit = bt < _BIG
    tmin_c = np.float32(t_min)

    gx, gy, gz = cx - ox, cy - oy, cz - oz
    nb = gx * dx + gy * dy + gz * dz
    c_j = gx * gx + gy * gy + gz * gz - rsq
    sq = safe_sqrt(nb * nb - c_j)
    t1 = nb - sq
    t = jnp.where(t1 > tmin_c, t1, nb + sq)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = (px - cx) * ivr
    ny = (py - cy) * ivr
    nz = (pz - cz) * ivr
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * inv_len, ny * inv_len, nz * inv_len

    b_imp = jnp.sqrt(jnp.maximum(c_j + rsq - nb * nb, 1e-20))
    edge = jnp.sqrt(jnp.maximum(rsq, 0.0)) - b_imp
    cover = jax.nn.sigmoid(edge * np.float32(1.0 / soft_eps))
    t2 = nb + sq
    px2 = ox + t2 * dx
    py2 = oy + t2 * dy
    pz2 = oz + t2 * dz

    mt_f = jnp.floor(mtp * (1.0 / 32.0))
    mt_i = mt_f.astype(jnp.int32)
    mparam = mtp - mt_f * 32.0
    a_r = jnp.floor(albp * (1.0 / 65536.0))
    rem = albp - a_r * 65536.0
    a_g = jnp.floor(rem * (1.0 / 256.0))
    a_b = rem - a_g * 256.0
    inv255 = np.float32(1.0 / 255.0)

    rec = HitRecord(hit=hit, t=t, px=px, py=py, pz=pz,
                    nx=nx, ny=ny, nz=nz, mat_type=mt_i,
                    albedo_x=a_r * inv255, albedo_y=a_g * inv255,
                    albedo_z=a_b * inv255,
                    fuzz=mparam, ref_idx=jnp.where(mt_i == 2, mparam, 1.0),
                    cover=cover, px2=px2, py2=py2, pz2=pz2)
    return hit, px, py, pz, rec


def _make_bounce(spheres_smem, ray_id, *, num_spheres: int,
                 max_bounces: int, t_min: float, seed: int, sub: int,
                 unroll: int, topo_ref=None, soft_eps: float = 0.0):
    """Build the per-bounce wavefront update closure over the sphere SMEM refs.

    Shared by the one-shot megakernel (_kernel) and the resumable phase kernel
    (_phase_kernel). With `topo_ref` (VMEM (max_bounces+1, sub, LANES) i32),
    each bounce writes its per-lane hit topology plane: the winning sphere's
    row index for live hit lanes, -1 otherwise — consumed by the
    megakernel-forward gradient replay (grad/mega.py).

    soft_eps > 0: the soft-silhouette estimator, traced in-kernel — graze
    promotion in the sweep (_make_intersect), then the detached two-branch
    update of render/integrator._bounce_step: the lane bounces off the
    winning sphere with probability cover, else passes through from the far
    exit. Topology then records the PROMOTED index, which is what the
    gradient replay consumes (promote=False re-promotion is skipped
    there)."""
    seed_c = np.uint32(seed)
    isect = _make_intersect(spheres_smem,
                            num_spheres=num_spheres, t_min=t_min, sub=sub,
                            unroll=unroll,
                            carry_index=topo_ref is not None,
                            soft_eps=soft_eps)
    idx_pos = 8 if soft_eps else 7

    def bounce(state):
        (b, ox, oy, oz, dx, dy, dz, ar, ag, ab, rr, rg, rb, alive, cnt) = state
        cnt = cnt + alive.astype(jnp.int32)

        best = isect(ox, oy, oz, dx, dy, dz)
        if soft_eps:
            hit, px, py, pz, rec = _soft_hit_record(
                best, ox, oy, oz, dx, dy, dz, t_min, soft_eps)
        else:
            hit, px, py, pz, rec = _closest_hit_record(
                best, ox, oy, oz, dx, dy, dz)
        if topo_ref is not None:
            plane = jnp.where(alive & hit,
                              best[idx_pos].astype(jnp.int32), -1)

            # sync_every batching can overshoot to b = max_bounces + 1 (all
            # lanes provably dead there — cont requires b < max_bounces).
            # Unguarded, that write would CLAMP onto plane max_bounces and
            # clobber the depth-capped lanes' real topology with -1, making
            # the gradient replay add sky for paths that died black
            # (regression: test_mega_grad_matches_pipeline's mb=3 case).
            @pl.when(b <= max_bounces)
            def _():
                topo_ref[pl.ds(b, 1)] = plane[None]

        # Miss -> sky accumulation (rayweek1.cpp:530-534).
        skr, skg, skb = sky_color(dx, dy, dz)
        miss = alive & ~hit
        rr = rr + jnp.where(miss, ar * skr, 0.0)
        rg = rg + jnp.where(miss, ag * skg, 0.0)
        rb = rb + jnp.where(miss, ab * skb, 0.0)

        (sx, sy, sz), (mr, mg, mb), ok = scatter(dx, dy, dz, rec, seed_c,
                                                 ray_id, b)
        if soft_eps:
            # Detached two-branch estimator, identical update order to
            # render/integrator._bounce_step's soft block (the kernel is
            # the PRIMAL: cover/sg(cover) == 1 numerically, but the same
            # expressions are kept so the image matches the XLA soft
            # renderer bitwise in interpreter mode).
            u = rng_mod.uniform01(seed_c, ray_id, b,
                                  rng_mod.Slots.SILHOUETTE_P)
            cov = rec.cover
            take = u < cov
            w_b = cov / jnp.maximum(cov, 1e-20)
            w_t = (1.0 - cov) / jnp.maximum(1.0 - cov, 1e-20)
            sx = jnp.where(take, sx, dx)
            sy = jnp.where(take, sy, dy)
            sz = jnp.where(take, sz, dz)
            mr = jnp.where(take, mr * w_b, w_t)
            mg = jnp.where(take, mg * w_b, w_t)
            mb = jnp.where(take, mb * w_b, w_t)
            ok = (take & ok) | ~take
            px = jnp.where(take, px, rec.px2)
            py = jnp.where(take, py, rec.py2)
            pz = jnp.where(take, pz, rec.pz2)
        cont = alive & hit & ok & (b < max_bounces)
        ox = jnp.where(cont, px, ox)
        oy = jnp.where(cont, py, oy)
        oz = jnp.where(cont, pz, oz)
        dx = jnp.where(cont, sx, dx)
        dy = jnp.where(cont, sy, dy)
        dz = jnp.where(cont, sz, dz)
        ar = jnp.where(cont, ar * mr, ar)
        ag = jnp.where(cont, ag * mg, ag)
        ab = jnp.where(cont, ab * mb, ab)
        return (b + 1, ox, oy, oz, dx, dy, dz, ar, ag, ab, rr, rg, rb,
                cont, cnt)

    return bounce


# State-scratch layout shared by both kernels: 13 (sub, LANES) f32 planes
# holding (ox..dz, ar..ab, rr..rb, alive-as-float).
def _state_io(st_ref):
    def write_state(state):
        for i, v in enumerate(state[1:14]):
            st_ref[i] = v.astype(jnp.float32) if v.dtype == jnp.bool_ else v

    def read_state(b):
        vals = [st_ref[i] for i in range(13)]
        return (b,) + tuple(vals[:12]) + (vals[12] > 0.0,)

    return write_state, read_state


def _kernel(spheres_smem, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref,
            rid_ref, rr_ref, rg_ref, rb_ref, cnt_ref, *refs, num_spheres: int,
            max_bounces: int, t_min: float, seed: int, n_rays: int,
            tile_rays: int, sub: int, unroll: int,
            sync_every: int = 1, debug_iters: bool = False,
            emit_topology: bool = False, soft_eps: float = 0.0):
    k = 0
    topo_ref = None
    if emit_topology:
        topo_ref = refs[0]
        k = 1
    iters_ref = refs[k] if debug_iters else None
    # True global ray ids (arbitrary order — the caller may permute rays for
    # spatial coherence; ids >= n_rays mark padding lanes).
    ray_id = rid_ref[...]
    zero = jnp.zeros((sub, LANES), jnp.float32)
    one = zero + 1.0
    alive0 = ray_id < n_rays

    # Mosaic cannot carry vectors through scf.while; park the per-ray state
    # in VMEM scratch refs and carry only scalars (bounce index + any-alive).
    def run(st_ref):
        bounce = _make_bounce(
            spheres_smem, ray_id, num_spheres=num_spheres,
            max_bounces=max_bounces, t_min=t_min, seed=seed, sub=sub,
            unroll=unroll, topo_ref=topo_ref, soft_eps=soft_eps)
        write_state, read_state = _state_io(st_ref)

        write_state((jnp.int32(0), ox_ref[...], oy_ref[...], oz_ref[...],
                     dx_ref[...], dy_ref[...], dz_ref[...],
                     one, one, one, zero, zero, zero, alive0))
        cnt_ref[...] = jnp.zeros((sub, LANES), jnp.int32)
        if topo_ref is not None:
            # Bounces past a tile's early exit keep the "no hit" marker.
            topo_ref[...] = jnp.full((max_bounces + 1, sub, LANES), -1,
                                     jnp.int32)

        def body(carry):
            # `sync_every` bounces per early-exit check: the vector->scalar
            # alive reduction stalls the VPU pipeline (~1 us measured), which
            # dominates a bounce for small sphere counts. Overshooting is
            # semantically free — dead lanes add no radiance and no count.
            b, _ = carry
            state = read_state(b) + (cnt_ref[...],)
            for _ in range(sync_every):
                state = bounce(state)
            write_state(state[:14])
            cnt_ref[...] = state[14]
            alive_any = jnp.max(jnp.where(state[13], 1, 0))
            return (b + sync_every, alive_any)

        fin = jax.lax.while_loop(
            lambda c: (c[0] <= max_bounces) & (c[1] > 0), body,
            (jnp.int32(0), jnp.int32(1)))
        if debug_iters:
            iters_ref[...] = jnp.full((sub, LANES), 1, jnp.int32) * fin[0]

        final = read_state(jnp.int32(0))
        rr_ref[...] = final[10]
        rg_ref[...] = final[11]
        rb_ref[...] = final[12]

    pl.run_scoped(run, pltpu.VMEM((13, sub, LANES), jnp.float32))


def _respawn_kernel(sspan_smem, spheres_smem, cam_smem, pid_ref,
                    x_ref, y_ref, rr_ref, rg_ref, rb_ref, cnt_ref, *refs,
                    num_spheres: int, spp: int, width: int, height: int,
                    num_pixels: int, max_bounces: int, t_min: float,
                    seed: int, sub: int, unroll: int,
                    sync_every: int, debug_iters: bool):
    """Persistent-lane megakernel: LANE = PIXEL, sample respawn in-register.

    The one-shot kernel's whole-tile early exit leaves 2.4-3.3x dead-lane
    waste at deep bounce budgets: a tile sweeps all 2048 lanes until its
    SLOWEST ray dies (up to max_bounces), because TPU vectors cannot retire
    lanes individually — the reference's recursion, by contrast, returns each
    ray the instant it dies (rayweek1.cpp:515-536). This kernel gets the same
    per-ray retirement a different way: each lane owns ONE pixel and traces
    that pixel's spp samples SERIALLY; the moment a lane's current path ends
    (sky miss / absorb / bounce cap) it regenerates the next sample's primary
    ray in-register — the stateless RNG and thin-lens camera make raygen pure
    per-lane arithmetic, so respawn needs no queue, no compaction, no memory
    traffic. Lanes desynchronize freely (each carries its own per-lane bounce
    counter for the RNG lattice); a tile exits when every lane has exhausted
    its spp samples, so per-tile waste is bounded by the spread of per-PIXEL
    total work (spp paths, self-averaging) instead of per-RAY depth.

    Radiance lands directly in per-pixel accumulators (the sample sums the
    image needs anyway), which is what makes desynchronized retirement
    possible at all: sums are order-free, so no per-sample output slot — and
    no scatter — is ever needed. Per-ray math (intersection, scatter, RNG
    draws) is bit-identical to the one-shot kernel; only the order the sample
    sums are added in differs (tested within float tolerance of the XLA
    pipeline, with EXACT ray counts).

    sspan_smem (1, 2) int32 holds [s_lo, s_hi): the sample slice each lane
    traces ([0, spp) single-chip; a sample-sharded device passes its slice —
    ray ids stay global, so any mesh factorization draws identical rays).
    """
    iters_ref = refs[0] if debug_iters else None
    s_lo = sspan_smem[0, 0]
    s_hi = sspan_smem[0, 1]
    pid = pid_ref[...]
    xf = x_ref[...]
    yf = y_ref[...]
    zero = jnp.zeros((sub, LANES), jnp.float32)
    one = zero + 1.0
    izero = jnp.zeros((sub, LANES), jnp.int32)
    seed_c = np.uint32(seed)
    spp_c = np.int32(spp)
    cam = _cam_from_smem(cam_smem)
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    lane_valid = pid < num_pixels

    def make_ray(rid):
        # Identical jnp code to the XLA pipeline's raygen
        # (kernels/pipeline.py raygen + render/camera.py:71-90), traced into
        # the kernel; keyed on the true ray id, so a respawned sample draws
        # exactly the rays the one-shot kernel was fed for that id.
        ju, jv = rng_mod.pixel_jitter(seed_c, rid)
        s = (xf + ju) * inv_w
        t = (yf + jv) * inv_h
        return Camera.generate_rays(cam, s, t, seed_c, rid)

    def run(st_ref, si_ref):
        isect = _make_intersect(spheres_smem,
                                num_spheres=num_spheres, t_min=t_min,
                                sub=sub, unroll=unroll)

        def step(state):
            (ox, oy, oz, dx, dy, dz, ar, ag, ab, alive, s_idx, b) = state
            cnt_ref[...] = cnt_ref[...] + alive.astype(jnp.int32)
            rid = pid * spp_c + s_idx

            hit, px, py, pz, rec = _closest_hit_record(
                isect(ox, oy, oz, dx, dy, dz), ox, oy, oz, dx, dy, dz)

            # Miss -> sky, straight into the pixel accumulator.
            skr, skg, skb = sky_color(dx, dy, dz)
            miss = alive & ~hit
            rr_ref[...] = rr_ref[...] + jnp.where(miss, ar * skr, 0.0)
            rg_ref[...] = rg_ref[...] + jnp.where(miss, ag * skg, 0.0)
            rb_ref[...] = rb_ref[...] + jnp.where(miss, ab * skb, 0.0)

            (sx, sy, sz), (mr, mg, mb), ok = scatter(dx, dy, dz, rec,
                                                     seed_c, rid, b)
            cont = alive & hit & ok & (b < max_bounces)
            ox = jnp.where(cont, px, ox)
            oy = jnp.where(cont, py, oy)
            oz = jnp.where(cont, pz, oz)
            dx = jnp.where(cont, sx, dx)
            dy = jnp.where(cont, sy, dy)
            dz = jnp.where(cont, sz, dz)
            ar = jnp.where(cont, ar * mr, ar)
            ag = jnp.where(cont, ag * mg, ag)
            ab = jnp.where(cont, ab * mb, ab)
            b = jnp.where(cont, b + 1, b)

            # Respawn: a lane whose path just ended starts its next sample.
            ended = alive & ~cont
            resp = ended & (s_idx < s_hi - 1)
            s_idx = jnp.where(resp, s_idx + 1, s_idx)
            nox, noy, noz, ndx, ndy, ndz = make_ray(pid * spp_c + s_idx)
            ox = jnp.where(resp, nox, ox)
            oy = jnp.where(resp, noy, oy)
            oz = jnp.where(resp, noz, oz)
            dx = jnp.where(resp, ndx, dx)
            dy = jnp.where(resp, ndy, dy)
            dz = jnp.where(resp, ndz, dz)
            ar = jnp.where(resp, one, ar)
            ag = jnp.where(resp, one, ag)
            ab = jnp.where(resp, one, ab)
            b = jnp.where(resp, 0, b)
            alive = cont | resp
            return (ox, oy, oz, dx, dy, dz, ar, ag, ab, alive, s_idx, b)

        # Init: every valid lane starts on its pixel's first slice sample.
        ox, oy, oz, dx, dy, dz = make_ray(pid * spp_c + s_lo)
        for i, v in enumerate((ox, oy, oz, dx, dy, dz, one, one, one)):
            st_ref[i] = v
        st_ref[9] = (lane_valid & (s_lo < s_hi)).astype(jnp.float32)
        si_ref[0] = izero + s_lo
        si_ref[1] = izero
        rr_ref[...] = zero
        rg_ref[...] = zero
        rb_ref[...] = zero
        cnt_ref[...] = izero

        def body(carry):
            it, _ = carry
            state = tuple(st_ref[i] for i in range(9)) + \
                (st_ref[9] > 0.0, si_ref[0], si_ref[1])
            # As in _kernel, `sync_every` steps per early-exit check; an
            # overshoot step is idempotent once every lane is dead (no count,
            # no radiance, no respawn).
            for _ in range(sync_every):
                state = step(state)
            for i, v in enumerate(state[:9]):
                st_ref[i] = v
            st_ref[9] = state[9].astype(jnp.float32)
            si_ref[0] = state[10]
            si_ref[1] = state[11]
            alive_any = jnp.max(jnp.where(state[9], 1, 0))
            return (it + sync_every, alive_any)

        max_iters = spp * (max_bounces + 1)
        fin = jax.lax.while_loop(
            lambda c: (c[0] < max_iters) & (c[1] > 0), body,
            (jnp.int32(0), jnp.int32(1)))
        if debug_iters:
            iters_ref[...] = jnp.full((sub, LANES), 1, jnp.int32) * fin[0]

    pl.run_scoped(run, pltpu.VMEM((10, sub, LANES), jnp.float32),
                  pltpu.VMEM((2, sub, LANES), jnp.int32))


def _phase_kernel(bspan_smem, spheres_smem,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, rid_ref,
                  ar_ref, ag_ref, ab_ref, rr_ref, rg_ref, rb_ref, al_ref,
                  oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                  oar_ref, oag_ref, oab_ref, orr_ref, org_ref, orb_ref,
                  oal_ref, cnt_ref, *, num_spheres: int, max_bounces: int,
                  t_min: float, seed: int, sub: int, unroll: int):
    """Resumable wavefront phase: advance every live ray by up to
    (bspan[1] - bspan[0]) bounces, starting at absolute bounce bspan[0].

    Bitwise identical per ray to running _kernel straight through: the RNG is
    keyed on the absolute bounce index, and each lane's op sequence does not
    depend on which phase it runs in. A tile whose rays are all dead exits
    before the first sweep — after inter-phase compaction (see
    trace_pallas_wavefront) dead tiles cost only their DMA.
    """
    ray_id = rid_ref[...]
    b0 = bspan_smem[0, 0]
    bend = bspan_smem[0, 1]

    def run(st_ref):
        bounce = _make_bounce(
            spheres_smem, ray_id, num_spheres=num_spheres,
            max_bounces=max_bounces, t_min=t_min, seed=seed, sub=sub,
            unroll=unroll)
        write_state, read_state = _state_io(st_ref)

        alive_in = al_ref[...]
        write_state((b0, ox_ref[...], oy_ref[...], oz_ref[...],
                     dx_ref[...], dy_ref[...], dz_ref[...],
                     ar_ref[...], ag_ref[...], ab_ref[...],
                     rr_ref[...], rg_ref[...], rb_ref[...],
                     alive_in > 0.0))
        cnt_ref[...] = jnp.zeros((sub, LANES), jnp.int32)

        def body(carry):
            b, _ = carry
            state = read_state(b) + (cnt_ref[...],)
            state = bounce(state)
            write_state(state[:14])
            cnt_ref[...] = state[14]
            alive_any = jnp.max(jnp.where(state[13], 1, 0))
            return (b + 1, alive_any)

        jax.lax.while_loop(
            lambda c: (c[0] <= max_bounces) & (c[0] < bend) & (c[1] > 0),
            body, (b0, jnp.max(jnp.where(alive_in > 0.0, 1, 0))))

        final = read_state(jnp.int32(0))
        for ref, v in zip((oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref,
                           odz_ref, oar_ref, oag_ref, oab_ref, orr_ref,
                           org_ref, orb_ref), final[1:13]):
            ref[...] = v
        oal_ref[...] = final[13].astype(jnp.float32)

    pl.run_scoped(run, pltpu.VMEM((13, sub, LANES), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_rays", "unroll",
                                    "sync_every", "interpret",
                                    "debug_iters", "n_rays",
                                    "emit_topology"))
def trace_pallas(spheres: PreparedSpheres, ox, oy, oz, dx, dy, dz, ray_id,
                 cfg: RenderConfig, tile_rays: int = 2048, unroll: int = 4,
                 sync_every: int = 1,
                 interpret: bool = False, debug_iters: bool = False,
                 n_rays: int = 0, emit_topology: bool = False
                 ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Trace N primary rays through the megakernel.

    Lanes with ray_id >= n_rays are padding (never alive, never counted);
    n_rays defaults to min(N, cfg.num_primary_rays) — a sharded caller whose
    per-device slice is smaller than the global ray count passes
    n_rays=cfg.num_primary_rays explicitly (ids are always global). N must be
    a multiple of tile_rays. Returns ((rr, rg, rb) f32[N], num_rays uint32).
    Semantically matches render.integrator.trace (tested against it in
    tests/test_megakernel.py).

    `emit_topology`: additionally return topo int32[max_bounces+1, N] in
    SLOT order — each bounce's winning sphere row index for live hit lanes,
    -1 otherwise (megakernel-forward gradients, grad/mega.py).
    """
    assert not (emit_topology and debug_iters)
    n = ox.shape[0]
    assert n % tile_rays == 0, (n, tile_rays)
    sub = tile_rays // LANES
    num_tiles = n // tile_rays
    n_active = n_rays if n_rays > 0 else min(n, cfg.num_primary_rays)

    packed = _pack_spheres(spheres)
    shape2 = (num_tiles * sub, LANES)
    as2d = lambda a: a.reshape(shape2)

    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel,
        num_spheres=spheres.count,
        max_bounces=cfg.max_bounces,
        t_min=cfg.t_min,
        seed=cfg.seed,
        n_rays=n_active,
        tile_rays=tile_rays,
        sub=sub,
        unroll=unroll,
        sync_every=sync_every,
        debug_iters=debug_iters,
        emit_topology=emit_topology,
        soft_eps=float(cfg.soft_silhouette),
    )
    out_specs = [
        ray_spec, ray_spec, ray_spec,
        pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
    ]
    nb1 = cfg.max_bounces + 1
    if emit_topology:
        out_specs.append(pl.BlockSpec((nb1, sub, LANES),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nb1,) + shape2, jnp.int32))
    if debug_iters:
        out_specs.append(pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shape2, jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(packed, as2d(ox), as2d(oy), as2d(oz), as2d(dx), as2d(dy),
      as2d(dz), as2d(ray_id))
    rr, rg, rb, cnt = outs[:4]

    res = (rr.reshape(n), rg.reshape(n), rb.reshape(n)), \
        jnp.sum(cnt).astype(jnp.uint32)
    if emit_topology:
        return res + (outs[4].reshape(nb1, n),)
    if debug_iters:
        # (per-tile while iterations, per-ray live-bounce count in slot order)
        return res + (outs[4].reshape(num_tiles, tile_rays)[:, 0],
                      cnt.reshape(n))
    return res


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_lanes", "unroll",
                                    "sync_every", "interpret",
                                    "debug_iters", "num_pixels"))
def trace_pallas_respawn(spheres: PreparedSpheres, camera: Camera, pid, x, y,
                         cfg: RenderConfig, tile_lanes: int = 2048,
                         unroll: int = 4,
                         sync_every: int = 1, interpret: bool = False,
                         debug_iters: bool = False, num_pixels: int = 0,
                         sample_span=None
                         ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Trace ALL cfg.spp samples of N pixels with the persistent-lane
    sample-respawn megakernel (see _respawn_kernel).

    pid: int32[N] pixel ids (y * width + x); lanes with pid >= num_pixels are
    padding (never alive, never counted). x, y: float32[N] pixel coordinates
    (precomputed — Mosaic integer div/mod stays off the hot path). N must be
    a multiple of tile_lanes. num_pixels defaults to min(N, cfg.num_pixels);
    sharded callers pass the global pixel count. sample_span: optional
    (1, 2) int32 [s_lo, s_hi) restricting each pixel to a sample slice
    (sample-sharded meshes); default all of [0, cfg.spp).

    Returns ((rr, rg, rb) f32[N] per-pixel SAMPLE SUMS over the span —
    divide by cfg.spp for the full-span mean — and the uint32 ray count).
    Per-ray math matches trace_pallas bit-for-bit; the pixel sums differ from
    summing trace_pallas's per-ray output only in float addition order.
    """
    n = pid.shape[0]
    assert n % tile_lanes == 0, (n, tile_lanes)
    assert not cfg.soft_silhouette, \
        "the respawn engine is the HARD renderer (soft mode lives in the " \
        "one-shot kernel, the gradient-forward path)"
    assert cfg.spp >= 1
    sub = tile_lanes // LANES
    num_tiles = n // tile_lanes
    npix = num_pixels if num_pixels > 0 else min(n, cfg.num_pixels)

    packed = _pack_spheres(spheres)
    camp = _pack_camera(camera)
    if sample_span is None:
        sample_span = jnp.asarray([[0, cfg.spp]], jnp.int32)
    shape2 = (num_tiles * sub, LANES)
    as2d = lambda a: a.reshape(shape2)

    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _respawn_kernel,
        num_spheres=spheres.count,
        spp=cfg.spp,
        width=cfg.width,
        height=cfg.height,
        num_pixels=npix,
        max_bounces=cfg.max_bounces,
        t_min=cfg.t_min,
        seed=cfg.seed,
        sub=sub,
        unroll=unroll,
        sync_every=sync_every,
        debug_iters=debug_iters,
    )
    out_specs = [ray_spec, ray_spec, ray_spec, ray_spec]
    out_shape = [
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
    ]
    if debug_iters:
        out_specs.append(ray_spec)
        out_shape.append(jax.ShapeDtypeStruct(shape2, jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(camp.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(sample_span, packed, camp, as2d(pid), as2d(x), as2d(y))
    rr, rg, rb, cnt = outs[:4]

    res = (rr.reshape(n), rg.reshape(n), rb.reshape(n)), \
        jnp.sum(cnt).astype(jnp.uint32)
    if debug_iters:
        # (per-tile while iterations, per-pixel live-bounce count)
        return res + (outs[4].reshape(num_tiles, tile_lanes)[:, 0],
                      cnt.reshape(n))
    return res


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_rays", "unroll",
                                    "schedule", "interpret",
                                    "n_rays"))
def trace_pallas_wavefront(spheres: PreparedSpheres, ox, oy, oz, dx, dy, dz,
                           ray_id, cfg: RenderConfig, tile_rays: int = 2048,
                           unroll: int = 16,
                           schedule: Tuple[int, ...] = (2, 3, 6),
                           interpret: bool = False, n_rays: int = 0
                           ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Wavefront-compacted trace: phases of K bounces with live-ray compaction
    in between.

    The megakernel's tile early-exit only pays off when a WHOLE tile dies; a
    tile with one deep glass path sweeps all its dead lanes every bounce, and
    TPU grid steps run serially, so that waste is wall-clock. Between phases,
    rays are compacted at ROW granularity (one row = LANES consecutive rays):
    rows with any live ray are packed into the leading tiles, so fully-dead
    tiles exit before their first sphere sweep. Row granularity keeps the
    permutation tiny (n/LANES keys) and every move a contiguous 512-byte row —
    per-ray compaction via a 3.7M-element argsort measured ~1 s/phase on
    v5e, ~100x the win it buys. The reference never needs any of this: CPU
    recursion retires each ray the moment it dies; the compacted wavefront is
    the TPU-shaped equivalent.

    Per-ray radiance is BITWISE identical to trace_pallas (stateless RNG keyed
    on absolute (ray_id, bounce); lane order cannot change any ray's math).

    Same contract as trace_pallas: ((rr, rg, rb) f32[N] in input SLOT order,
    ray count), including the n_rays override for sharded callers whose
    per-device slice is smaller than the global ray count. schedule entries
    are bounces per phase; the cumulative budget is clamped down to
    max_bounces+1 (excess phases are skipped) and the LAST phase is extended
    up to it (a schedule that under-covers the bounce range would silently
    truncate paths).
    """
    n = ox.shape[0]
    assert not cfg.soft_silhouette, \
        "the wavefront engine is the HARD renderer (soft mode lives in " \
        "the one-shot kernel, the gradient-forward path)"
    assert schedule, schedule
    assert n % tile_rays == 0, (n, tile_rays)
    assert n < (1 << 26), n
    sub = tile_rays // LANES
    num_tiles = n // tile_rays
    n_active = n_rays if n_rays > 0 else min(n, cfg.num_primary_rays)

    packed = _pack_spheres(spheres)
    shape2 = (num_tiles * sub, LANES)
    as2d = lambda a: a.reshape(shape2)

    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _phase_kernel,
        num_spheres=spheres.count,
        max_bounces=cfg.max_bounces,
        t_min=cfg.t_min,
        seed=cfg.seed,
        sub=sub,
        unroll=unroll,
    )
    f32s = jax.ShapeDtypeStruct(shape2, jnp.float32)
    phase_call = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + [ray_spec] * 14,
        out_specs=tuple([ray_spec] * 14),
        out_shape=tuple([f32s] * 13 + [jax.ShapeDtypeStruct(shape2, jnp.int32)]),
        interpret=interpret,
    )

    rid = as2d(ray_id)
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
    state = [as2d(ox), as2d(oy), as2d(oz), as2d(dx), as2d(dy), as2d(dz),
             one, one, one, zero, zero, zero,
             (rid < n_active).astype(jnp.float32)]
    total = jnp.uint32(0)
    rows = shape2[0]
    # row_slot[j] = original row sitting at row j now (composed permutation).
    row_slot = jnp.arange(rows, dtype=jnp.int32)

    b0 = 0
    last = len(schedule) - 1
    for i, k in enumerate(schedule):
        if b0 > cfg.max_bounces:
            break  # budget exhausted; don't dispatch no-op phases
        bend = min(b0 + k, cfg.max_bounces + 1)
        if i == last:
            bend = cfg.max_bounces + 1  # never truncate the final phase
        bspan = jnp.asarray([[b0, bend]], jnp.int32)
        outs = phase_call(bspan, packed, *state[:6], rid, *state[6:])
        state = list(outs[:13])
        total = total + jnp.sum(outs[13]).astype(jnp.uint32)
        b0 = bend
        if i < last and b0 <= cfg.max_bounces:
            # Stable partition of ROWS: live-first, original order preserved
            # (keeps pixel-tile spatial coherence among survivors).
            dead_row = jnp.max(state[12], axis=1) <= 0.0
            key = jnp.arange(rows, dtype=jnp.int32) + \
                dead_row.astype(jnp.int32) * rows
            order = jnp.argsort(key)
            row_slot = jnp.take(row_slot, order, axis=0)
            rid = jnp.take(rid, order, axis=0)
            state = [jnp.take(s, order, axis=0) for s in state]

    # Undo the cumulative row permutation -> input slot order.
    inv = jnp.argsort(row_slot)
    return tuple(jnp.take(state[ch], inv, axis=0).reshape(n)
                 for ch in (9, 10, 11)), total
