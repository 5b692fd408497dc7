"""Pallas closest-hit *index* kernel for the differentiable pipeline.

The differentiable renderer (render/pipeline.py) needs gradients through the
hit record — but NOT through the argmin that selects the hit sphere (its
index is stop_gradient'ed by design, SURVEY.md §7.3). That splits cleanly:

  stage 1 (this kernel):  rays -> best sphere index per ray. O(N*S) but
                          gradient-free -> a lean Pallas sweep (one select
                          per sphere instead of seven).
  stage 2 (XLA, existing): recompute t/p/normal from the chosen sphere's
                          parameters — O(N), fully differentiable.

custom_vjp declares the kernel's outputs tangent-free, so reverse-mode AD
never tries to transpose the pallas_call.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rays1bench_tpu.scene.spheres import PreparedSpheres

LANES = 128
_INF = np.float32(np.inf)


def _kernel(spheres_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            idx_ref, hit_ref, *, num_spheres: int, t_min: float, sub: int,
            unroll: int):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmin_c = np.float32(t_min)
    zero = jnp.zeros((sub, LANES), jnp.float32)

    def one_sphere(s, carry):
        bt, bi = carry
        scx = spheres_smem[0, s]
        scy = spheres_smem[1, s]
        scz = spheres_smem[2, s]
        rsq = spheres_smem[3, s]
        cox = scx - ox
        coy = scy - oy
        coz = scz - oz
        nb = cox * dx + coy * dy + coz * dz
        c = cox * cox + coy * coy + coz * coz - rsq
        disc = nb * nb - c
        sq = jnp.where(disc > 0.0, jnp.sqrt(jnp.maximum(disc, 0.0)), _INF)
        t1 = nb - sq
        t2 = nb + sq
        t = jnp.where(t1 > tmin_c, t1, t2)
        tm = jnp.where(t > tmin_c, t, _INF)
        better = tm < bt
        bt = jnp.where(better, tm, bt)
        bi = jnp.where(better, s, bi)
        return bt, bi

    def group(g, carry):
        s0 = g * unroll
        for k in range(unroll):
            carry = one_sphere(s0 + k, carry)
        return carry

    bt, bi = jax.lax.fori_loop(0, num_spheres // unroll, group,
                               (zero + _INF, jnp.zeros((sub, LANES), jnp.int32)))
    idx_ref[...] = bi
    hit_ref[...] = (bt < np.float32(3e38)).astype(jnp.int32)


def _pack(prep: PreparedSpheres) -> jax.Array:
    rsq = jnp.where(prep.valid > 0.0, prep.radius_sq, -1e30)
    return jnp.stack([prep.center_x, prep.center_y, prep.center_z, rsq])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def closest_hit_index(spheres: PreparedSpheres, ox, oy, oz, dx, dy, dz,
                      t_min: float, tile_rays: int = 2048,
                      interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(best_idx int32[N], hit bool[N]) for N rays; N padded to tile_rays
    internally. Treated as a constant under differentiation."""
    n = ox.shape[0]
    pad = (-n) % tile_rays
    if pad:
        padder = lambda a: jnp.pad(a, (0, pad))
        ox, oy, oz = padder(ox), padder(oy), padder(oz)
        # Padding dirs are zero: disc = -co.co < 0 for any real sphere -> miss.
        dx, dy, dz = padder(dx), padder(dy), padder(dz)
    m = n + pad
    sub = tile_rays // LANES
    num_tiles = m // tile_rays
    shape2 = (num_tiles * sub, LANES)
    as2d = lambda a: a.reshape(shape2)
    unroll = 16 if spheres.count % 16 == 0 else 1

    packed = _pack(spheres)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    idx, hit = pl.pallas_call(
        functools.partial(_kernel, num_spheres=spheres.count, t_min=t_min,
                          sub=sub, unroll=unroll),
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(packed.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct(shape2, jnp.int32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)),
        interpret=interpret,
    )(packed, as2d(ox), as2d(oy), as2d(oz), as2d(dx), as2d(dy), as2d(dz))
    return idx.reshape(m)[:n], hit.reshape(m)[:n] > 0


def _fwd(spheres, ox, oy, oz, dx, dy, dz, t_min, tile_rays, interpret):
    out = closest_hit_index(spheres, ox, oy, oz, dx, dy, dz, t_min,
                            tile_rays, interpret)
    return out, (spheres, ox, oy, oz, dx, dy, dz)


def _bwd(t_min, tile_rays, interpret, residuals, cotangents):
    # Hit topology is constant under differentiation: zero tangents for every
    # primal input (the sphere pytree and the six ray arrays).
    del cotangents
    return jax.tree_util.tree_map(jnp.zeros_like, residuals)


closest_hit_index.defvjp(_fwd, _bwd)
