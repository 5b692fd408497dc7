"""Stateless counter-based RNG.

The reference threads mutable xorshift32 state through every call
(reference: src/latest/mymath.h:17-73 — XorShift32 / myrand01 / myrand02 and
their 4-lane SSE variants; per-thread streams seeded at rayweek1.cpp:800-802).
Mutable RNG streams are the wrong shape for SPMD TPU code: they serialize, they
make results depend on scheduling, and they can't be vmapped.

Here every draw is a pure function of integer coordinates
(seed, ray_id, bounce, draw_slot) hashed to uniform bits. The same coordinates
give the same number on any backend, any sharding, any chunking — which is what
makes images deterministic under `shard_map` without any cross-device RNG state.

The hash is the PCG-family integer hash ("pcg_hash" from Jarzynski & Olano,
"Hash Functions for GPU Rendering", JCGT 2020) — a few VPU-friendly integer ops,
usable identically inside Pallas kernels and plain jnp code.

Uniform floats keep the reference's 24-bit-mantissa convention:
myrand01 = (bits & 0xFFFFFF) / 2^24  (mymath.h:27-30).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Large odd constants for decorrelating the counter axes (Weyl-style).
_STREAM_RAY = np.uint32(0x9E3779B9)     # golden-ratio increment
_STREAM_BOUNCE = np.uint32(0x85EBCA77)
_STREAM_SLOT = np.uint32(0xC2B2AE3D)

_INV_2_24 = np.float32(1.0 / 16777216.0)
_TWO_PI = np.float32(6.2831853071795864769)


def pcg_hash(x):
    """One round of the PCG-RXS-M-XS output permutation on a uint32 state."""
    x = x.astype(jnp.uint32)
    state = x * np.uint32(747796405) + np.uint32(2891336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(277803737)
    return (word >> np.uint32(22)) ^ word


def hash_bits(seed, ray_id, bounce, slot):
    """uint32 random bits for lattice coordinates (seed, ray_id, bounce, slot).

    All arguments broadcast; ray_id is typically an (N,) int32 lane array while
    seed/bounce/slot are scalars.
    """
    seed = jnp.asarray(seed).astype(jnp.uint32)
    h = pcg_hash(seed ^ (jnp.asarray(ray_id).astype(jnp.uint32) * _STREAM_RAY))
    h = pcg_hash(h ^ (jnp.asarray(bounce).astype(jnp.uint32) * _STREAM_BOUNCE))
    h = pcg_hash(h ^ (jnp.asarray(slot).astype(jnp.uint32) * _STREAM_SLOT))
    return h


def bits_to_uniform01(bits):
    """bits -> float32 in [0, 1) using the top-independent 24-bit convention
    of the reference's myrand01 (mymath.h:27-30)."""
    # Mask to 24 bits, then cast via int32 (Mosaic lacks a u32->f32 cast; the
    # masked value always fits in int32).
    return (bits & np.uint32(0xFFFFFF)).astype(jnp.int32).astype(jnp.float32) * _INV_2_24


def uniform01(seed, ray_id, bounce, slot):
    """Uniform float32 in [0, 1)."""
    return bits_to_uniform01(hash_bits(seed, ray_id, bounce, slot))


def uniform02(seed, ray_id, bounce, slot):
    """Uniform float32 in [0, 2) — the reference's myrand02 (mymath.h:32-35)."""
    return uniform01(seed, ray_id, bounce, slot) * np.float32(2.0)


def _gaussian_pair(seed, ray_id, bounce, slot):
    """Two iid standard normals via Box-Muller from slots (slot, slot+1)."""
    u1 = uniform01(seed, ray_id, bounce, slot)
    u2 = uniform01(seed, ray_id, bounce, slot + 1)
    # Guard u1 > 0 so log() is finite: shift into (2^-25, 1].
    r = jnp.sqrt(np.float32(-2.0) * jnp.log1p(-u1 + np.float32(2.0 ** -25)))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def in_unit_ball(seed, ray_id, bounce, slot0=0):
    """Uniform point inside the unit ball, returned as three component arrays.

    The reference rejects uniform cube samples (mymath.h:224-235,
    random_in_unit_sphere) — an unbounded data-dependent loop that can't live
    under jit. Same distribution analytically: an isotropic direction (normalized
    3-gaussian) scaled by cbrt(u), so volume is uniform. Uses slots
    slot0..slot0+4.
    """
    gx, gy = _gaussian_pair(seed, ray_id, bounce, slot0)
    gz, _ = _gaussian_pair(seed, ray_id, bounce, slot0 + 2)
    u = uniform01(seed, ray_id, bounce, slot0 + 4)
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    # cbrt(u) as exp(log(u)/3): cbrt has no Mosaic (Pallas TPU) lowering, and
    # this form is exact to ulp-level for u in (0,1]. Clamp keeps log finite.
    cbrt_u = jnp.exp(jnp.log(jnp.maximum(u, np.float32(1e-30))) * np.float32(1.0 / 3.0))
    # norm == 0 has probability ~0 but would give NaN; clamp.
    scale = cbrt_u / jnp.maximum(norm, np.float32(1e-20))
    return gx * scale, gy * scale, gz * scale


def in_unit_disk(seed, ray_id, bounce, slot0=0):
    """Uniform point inside the unit disk (x, y components).

    Replaces the reference's rejection loop random_in_unit_disk
    (rayweek1.cpp:353-362) with the analytic polar map. Uses slots
    slot0, slot0+1.
    """
    u = uniform01(seed, ray_id, bounce, slot0)
    v = uniform01(seed, ray_id, bounce, slot0 + 1)
    r = jnp.sqrt(u)
    theta = _TWO_PI * v
    return r * jnp.cos(theta), r * jnp.sin(theta)


# Reserved draw-slot layout per (ray, bounce). Keeping slots disjoint and fixed
# makes every draw reproducible no matter which material branch consumes it.
class Slots:
    PIXEL_JITTER_U = 0     # primary-ray uv jitter (bounce == -1 lattice row)
    PIXEL_JITTER_V = 1
    LENS_U = 2             # thin-lens aperture sample
    LENS_V = 3
    SCATTER_BALL = 8       # 5 slots: lambertian/metal unit-ball sample
    DIELECTRIC_P = 13      # reflect-vs-refract probability draw
