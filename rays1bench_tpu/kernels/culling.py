"""Morton sort-trim support (device-side, jit-traceable).

The reference tests every ray against every sphere (rayweek1.cpp:190-226);
its only skip is the placeholder check (:291). Here, spheres are sorted by
the Morton code of their centers (spatially coherent row order) with
placeholder rows last, so the megakernel pipeline can trim padding down to
the next power of two before staging the SoA in SMEM
(kernels/pipeline.prepare_trimmed).

A one-level chunk-bounds culled intersector was also built on top of this
ordering and measured OUT on both the 512-row large scene (-25%) and the
4096-row giant stress scene (0.83-1.00x across both engines and chunk
sizes 64-256): the per-chunk vector->scalar sync costs more than the
sweeps it skips, because a 2048-lane tile's rays point everywhere after
one bounce, so the any-lane-can-hit union test almost never culls.
Removed — tools/culling_probe.py and records/culling.txt keep the
measurement.

Everything here is pure jnp and runs ON DEVICE inside the render jit: sphere
counts are tiny, and doing it host-side would cost device->host round trips
per call (~10 ms each over a tunneled TPU — measured 20% of a frame).
Sorting is order-only metadata: it cannot change the closest-hit result
(ties are measure-zero), so images are unchanged.
"""

from __future__ import annotations

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

