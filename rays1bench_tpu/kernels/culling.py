"""Sphere-chunk culling support (host-side precompute).

The reference tests every ray against every sphere (rayweek1.cpp:190-226);
its only skip is the placeholder check (:291). On TPU we can do better with a
one-level bounding-volume hierarchy that stays SPMD-friendly:

* spheres are sorted by the Morton code of their centers so consecutive
  spheres are spatially near each other,
* each chunk of `chunk_size` sorted spheres gets a conservative bounding
  sphere,
* the megakernel tests each chunk bound against the whole ray tile with one
  vector op chain and skips the chunk's sphere loop (`@pl.when`) if no ray
  can hit it. Placeholder rows get poisoned bounds, so padding chunks are
  skipped for free — the masked-SPMD generalization of the reference's
  placeholder skip.

All of this is order-only metadata: sorting spheres cannot change the
closest-hit result (ties are measure-zero), so images are unchanged.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread 10 bits to every 3rd bit (for 30-bit 3D Morton codes)."""
    v = v.astype(np.uint64)
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton_order(cx: np.ndarray, cy: np.ndarray, cz: np.ndarray,
                 valid: np.ndarray) -> np.ndarray:
    """Permutation sorting real spheres by 3D Morton code; placeholders last.

    Stable within equal codes, so the sort is deterministic."""
    lo = np.array([cx[valid].min(), cy[valid].min(), cz[valid].min()]
                  if valid.any() else [0, 0, 0])
    hi = np.array([cx[valid].max(), cy[valid].max(), cz[valid].max()]
                  if valid.any() else [1, 1, 1])
    span = np.maximum(hi - lo, 1e-9)
    q = lambda a, i: np.clip(((a - lo[i]) / span[i]) * 1023.0, 0, 1023).astype(np.uint32)
    code = (_expand_bits(q(cx, 0)) << 2) | (_expand_bits(q(cy, 1)) << 1) | _expand_bits(q(cz, 2))
    # placeholders sort after every real sphere
    code = np.where(valid, code, np.uint64(1) << 40)
    return np.argsort(code, kind="stable").astype(np.int32)


def chunk_bounds(cx: np.ndarray, cy: np.ndarray, cz: np.ndarray,
                 radius: np.ndarray, valid: np.ndarray, chunk_size: int
                 ) -> np.ndarray:
    """Bounding spheres per chunk of `chunk_size` consecutive (sorted) rows.

    Returns float32[4, n_chunks]: bcx, bcy, bcz, and the precomputed
    |bc|-side constant b_rsq = bounding_radius^2. Chunks containing only
    placeholders get b_rsq = -1e30 (discriminant always negative -> culled).
    """
    n = cx.shape[0]
    assert n % chunk_size == 0
    nch = n // chunk_size
    out = np.zeros((4, nch), np.float32)
    r = np.abs(radius)
    for c in range(nch):
        sl = slice(c * chunk_size, (c + 1) * chunk_size)
        v = valid[sl]
        if not v.any():
            out[3, c] = -1e30
            continue
        xs, ys, zs, rs = cx[sl][v], cy[sl][v], cz[sl][v], r[sl][v]
        bc = np.array([(xs - rs).min() + (xs + rs).max(),
                       (ys - rs).min() + (ys + rs).max(),
                       (zs - rs).min() + (zs + rs).max()]) * 0.5
        br = np.sqrt((xs - bc[0]) ** 2 + (ys - bc[1]) ** 2 + (zs - bc[2]) ** 2).max()
        br = float(br) if rs.size == 0 else float(
            np.max(np.sqrt((xs - bc[0]) ** 2 + (ys - bc[1]) ** 2 + (zs - bc[2]) ** 2) + rs))
        out[0, c], out[1, c], out[2, c] = bc
        # small epsilon pad for float conservatism
        out[3, c] = (br * 1.0001 + 1e-5) ** 2
    return out
