"""Sphere-chunk culling support (device-side, jit-traceable).

The reference tests every ray against every sphere (rayweek1.cpp:190-226);
its only skip is the placeholder check (:291). On TPU we can do better with a
one-level bounding-volume hierarchy that stays SPMD-friendly:

* spheres are sorted by the Morton code of their centers so consecutive
  spheres are spatially near each other,
* each chunk of `chunk_size` sorted spheres gets a conservative bounding
  sphere,
* the megakernel tests each chunk bound against the whole ray tile with one
  vector op chain and skips the chunk's sphere loop (`@pl.when`) if no ray
  can hit it. Placeholder rows sort last and get poisoned bounds, so padding
  chunks are skipped for free — the masked-SPMD generalization of the
  reference's placeholder skip.

Everything here is pure jnp and runs ON DEVICE inside the render jit: sphere
counts are tiny (<= 512), and doing it host-side would cost device->host
round trips per call (~10 ms each over a tunneled TPU — measured 20% of a
frame). Sorting is order-only metadata: it cannot change the closest-hit
result (ties are measure-zero), so images are unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _expand_bits(v):
    """Spread 10 bits to every 3rd bit (for 30-bit 3D Morton codes)."""
    v = v.astype(jnp.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton_order(cx, cy, cz, valid):
    """Permutation sorting real spheres by 3D Morton code; placeholders last.

    jnp throughout; stable sort, so deterministic."""
    cx = jnp.asarray(cx)
    cy = jnp.asarray(cy)
    cz = jnp.asarray(cz)
    valid = jnp.asarray(valid)
    big = np.float32(3e38)
    lo = [jnp.min(jnp.where(valid, c, big)) for c in (cx, cy, cz)]
    hi = [jnp.max(jnp.where(valid, c, -big)) for c in (cx, cy, cz)]
    codes = jnp.zeros(cx.shape, jnp.uint32)
    for shift, (c, l, h) in zip((2, 1, 0), zip((cx, cy, cz), lo, hi)):
        span = jnp.maximum(h - l, 1e-9)
        q = jnp.clip((c - l) / span * 1023.0, 0.0, 1023.0).astype(jnp.int32)
        codes = codes | (_expand_bits(q) << np.uint32(shift))
    # placeholders sort after every real sphere (codes < 2^30)
    codes = jnp.where(valid, codes, np.uint32(0xFFFFFFFF))
    return jnp.argsort(codes, stable=True).astype(jnp.int32)


def chunk_bounds(cx, cy, cz, radius, valid, chunk_size: int):
    """Bounding spheres per chunk of `chunk_size` consecutive (sorted) rows.

    Returns float32[4, n_chunks]: bcx, bcy, bcz, bounding_radius^2; chunks of
    only placeholders get radius^2 = -1e30 (always culled). jnp throughout.
    """
    cx = jnp.asarray(cx)
    n = cx.shape[0]
    assert n % chunk_size == 0, (n, chunk_size)
    nch = n // chunk_size
    r = jnp.abs(jnp.asarray(radius))
    valid = jnp.asarray(valid)
    big = np.float32(3e38)

    def per_axis(c):
        c = c.reshape(nch, chunk_size)
        lo = jnp.min(jnp.where(valid.reshape(nch, chunk_size),
                               c - r.reshape(nch, chunk_size), big), axis=1)
        hi = jnp.max(jnp.where(valid.reshape(nch, chunk_size),
                               c + r.reshape(nch, chunk_size), -big), axis=1)
        return (lo + hi) * 0.5

    bcx, bcy, bcz = per_axis(cx), per_axis(jnp.asarray(cy)), per_axis(jnp.asarray(cz))
    v2 = valid.reshape(nch, chunk_size)

    def dist(c, bc):
        return (c.reshape(nch, chunk_size) - bc[:, None]) ** 2

    d = jnp.sqrt(dist(cx, bcx) + dist(jnp.asarray(cy), bcy)
                 + dist(jnp.asarray(cz), bcz)) + r.reshape(nch, chunk_size)
    br = jnp.max(jnp.where(v2, d, 0.0), axis=1)
    any_valid = jnp.any(v2, axis=1)
    brsq = jnp.where(any_valid, (br * 1.0001 + 1e-5) ** 2, -1e30)
    return jnp.stack([bcx, bcy, bcz, brsq]).astype(jnp.float32)
