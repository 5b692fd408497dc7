"""Closest-hit ray/sphere intersection (pure-XLA version).

The reference's hot loop (reference: src/latest/rayweek1.cpp:152-339) is a
two-pass AVX2 kernel per ray: an 8-wide discriminant sweep with movemask
compaction of positive lanes, then a scalar closest-t pass over the survivors.
Compaction is branchy and scalar-tail-heavy — the wrong shape for a TPU. Here
the same math runs *dense and masked* over a whole (rays x spheres) tile:

  nb     = dot(center - origin, dir)        (rayweek1.cpp:196)
  c      = dot(co, co) - radius_sq          (rayweek1.cpp:199)
  discr  = nb^2 - c                         (rayweek1.cpp:201)
  t      = nb -/+ sqrt(discr), first root in (t_min, t_max) wins
           (pass 2, rayweek1.cpp:284-314)

and the "collect positives then scan" step becomes a masked argmin over the
sphere axis. Placeholder spheres are masked exactly like the reference's
inv_radius == 0 skip (rayweek1.cpp:291-292).

The ray count per call (N) is the wavefront width; the sphere count (S) is
padded to 128. The (N, S) intermediates are element-wise chains XLA fuses into
the reduction, so nothing quadratic is materialized in HBM.

Normalized ray directions are assumed (a = dot(d,d) = 1 — step9 semantics,
src/step9/rayweek1.cpp and SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rays1bench_tpu.core.vecmath import safe_sqrt
from rays1bench_tpu.scene.spheres import PreparedSpheres

_BIG = jnp.float32(3.0e38)


@jax.custom_vjp
def take_cols(cols, j):
    """Gather sphere columns by per-ray winning index: (C, S), int[N] -> (C, N).

    Same value as cols[:, j]. The custom VJP replaces the gather's transpose
    — a scatter-add of N per-ray cotangents into S sphere slots, which XLA
    serializes on TPU (measured ~0.9 ms per column per bounce at N=80K) —
    with a dense one-hot contraction sum_n ct[c, n] * (j[n] == s): one
    (C, N) x (N, S) reduction for ALL columns, fused by XLA, no scatter.
    This is the gradient-side twin of the forward's dense-masked redesign of
    the reference's compaction loop (rayweek1.cpp:205-226)."""
    return cols[:, j]


def _take_cols_fwd(cols, j):
    return cols[:, j], (j, cols.shape[1])


def _take_cols_bwd(res, ct):
    j, s = res
    onehot = (j[:, None] == jax.lax.iota(jnp.int32, s)[None, :])
    cols_ct = jnp.einsum("cn,ns->cs", ct, onehot.astype(ct.dtype))
    return cols_ct, np.zeros(j.shape, dtype=jax.dtypes.float0)


take_cols.defvjp(_take_cols_fwd, _take_cols_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """Planar hit payload (reference HitRecord, rayweek1.cpp:122-128, plus the
    flattened material columns that replace the Material* pointer)."""
    hit: jax.Array        # bool[N]
    t: jax.Array          # float32[N]
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    nx: jax.Array
    ny: jax.Array
    nz: jax.Array
    mat_type: jax.Array   # int32[N]
    albedo_x: jax.Array
    albedo_y: jax.Array
    albedo_z: jax.Array
    fuzz: jax.Array
    ref_idx: jax.Array
    # Soft-silhouette coverage in (0, 1] (cfg.soft_silhouette > 0 only;
    # None = hard renderer). Carries the silhouette-motion gradient.
    cover: object = None


def closest_hit(ox, oy, oz, dx, dy, dz, spheres: PreparedSpheres,
                t_min: float, t_max: float,
                soft_eps: float = 0.0) -> HitRecord:
    """Closest intersection of N rays against all S spheres.

    Two stages:
      1. dense masked sweep over the (N, S) candidate matrix -> per-ray argmin
         index (integer, inherently non-differentiable: hit *topology* is
         fixed under differentiation, SURVEY.md §7.3);
      2. O(N) recompute of t/p/normal from the chosen sphere's parameters, so
         gradients flow through a short, well-conditioned chain instead of
         through the full matrix.
    """
    # ---- stage 1: candidate t over all spheres --------------------------- #
    # (N,1) against (S,) broadcasts to (N,S).
    rox, roy, roz = ox[:, None], oy[:, None], oz[:, None]
    rdx, rdy, rdz = dx[:, None], dy[:, None], dz[:, None]

    cox = spheres.center_x - rox
    coy = spheres.center_y - roy
    coz = spheres.center_z - roz
    nb = cox * rdx + coy * rdy + coz * rdz
    c = cox * cox + coy * coy + coz * coz - spheres.radius_sq
    discr = nb * nb - c

    can_hit = (discr > 0.0) & (spheres.valid > 0.0)
    sq = jnp.sqrt(jnp.where(can_hit, discr, 0.0))
    t1 = nb - sq
    t2 = nb + sq
    # Reference pass 2 tries the near root first, then the far one
    # (rayweek1.cpp:297-313); since t1 < t2 always, that's equivalent to:
    t_cand = jnp.where(t1 > t_min, t1, t2)
    ok = can_hit & (t_cand > t_min) & (t_cand < t_max)
    t_masked = jnp.where(ok, t_cand, _BIG)

    best = jnp.argmin(t_masked, axis=1)           # first minimum wins
    hit = jnp.min(t_masked, axis=1) < _BIG
    return hit_record_from_index(ox, oy, oz, dx, dy, dz, spheres, best, hit,
                                 t_min, soft_eps=soft_eps)


def hit_record_from_index(ox, oy, oz, dx, dy, dz, spheres: PreparedSpheres,
                          best, hit, t_min: float,
                          soft_eps: float = 0.0) -> HitRecord:
    """Stage 2: differentiable hit record given the winning sphere index.

    O(N) recompute of t/p/normal from the chosen sphere's parameters, so
    gradients flow through a short, well-conditioned chain instead of through
    the full (N, S) matrix. `best`/`hit` may come from the XLA argmin above
    or from the Pallas index kernel (kernels/intersect_pallas.py)."""
    j = jax.lax.stop_gradient(best)
    (cx, cy, cz, rsq, inv_r, alb_x, alb_y, alb_z, fuzz, ref_idx) = take_cols(
        jnp.stack([spheres.center_x, spheres.center_y, spheres.center_z,
                   spheres.radius_sq, spheres.inv_radius, spheres.albedo_x,
                   spheres.albedo_y, spheres.albedo_z, spheres.fuzz,
                   spheres.ref_idx]), j)

    gx, gy, gz = cx - ox, cy - oy, cz - oz
    nb_j = gx * dx + gy * dy + gz * dz
    c_j = gx * gx + gy * gy + gz * gz - rsq
    sq_j = safe_sqrt(nb_j * nb_j - c_j)
    t1_j = nb_j - sq_j
    t = jnp.where(t1_j > t_min, t1_j, nb_j + sq_j)

    cover = None
    if soft_eps:
        # Normalized silhouette coordinate: disc / |r^2| is 1 for a ray
        # through the center, 0 at the silhouette, dimensionless — so one
        # soft_eps works across sphere scales. Interior hits saturate the
        # sigmoid to 1 (exact render); the gradient d cover / d (center,
        # radius) at the edge is the silhouette-motion term.
        disc_n = (nb_j * nb_j - c_j) / jnp.maximum(jnp.abs(rsq), 1e-20)
        cover = jax.nn.sigmoid(disc_n * jnp.float32(1.0 / soft_eps))

    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    # normal = (p - center) * inv_radius (rayweek1.cpp:321); signed inv_radius
    # flips the normal for hollow-glass (negative-radius) spheres.
    nx = (px - cx) * inv_r
    ny = (py - cy) * inv_r
    nz = (pz - cz) * inv_r

    return HitRecord(
        hit=hit, t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
        mat_type=jnp.take(spheres.mat_type, j),
        albedo_x=alb_x, albedo_y=alb_y, albedo_z=alb_z,
        fuzz=fuzz, ref_idx=ref_idx, cover=cover,
    )
