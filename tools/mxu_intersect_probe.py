"""MXU intersection probe: can the sphere sweep ride the matrix unit?

The megakernel is intersection-bound (512 sphere rows x ~26 VPU ops per ray,
tools/waste_probe.py) while the MXU — the chip's main compute resource — sits
idle. The discriminant math is matmul-shaped (reference hot region:
src/latest/rayweek1.cpp:190-226):

    nb[s,t] = C_s . d_t - (o_t . d_t)
    c [s,t] = |C_s|^2 - rsq_s - 2 C_s . o_t + |o_t|^2

Both are affine in per-sphere features [Cx, Cy, Cz, |C|^2 - rsq, 1], so ONE
(SB, 8) @ (8, 2T) matmul per sphere block yields nb and c for a whole ray
tile. The VPU epilogue is then ~12 ops/element (disc, sqrt, root select, key
pack, running min) instead of 26, and the dot products run on the MXU in
parallel with it.

Closest-hit selection uses a bitcast argmin: valid t are positive floats, so
their IEEE bit patterns order like ints; steal the low 10 mantissa bits for
the sphere index and take one jnp.min. The winner's payload is gathered with
a one-hot (8, SB) @ (SB, T) matmul, and exact t is recomputed from the
gathered center/radius with the reference's co = C - o formulation — so the
output t is bit-identical to the VPU sweep whenever the argmin agrees (it can
differ only for hits within 1024 ULP of each other).

Placeholder spheres keep the poisoned-rsq trick: kk = |C|^2 - (-1e30) makes c
astronomically positive, disc negative, sqrt NaN, and NaN loses every
comparison — no masks.

Usage:
    python tools/mxu_intersect_probe.py --check          # CPU interpret parity
    python tools/mxu_intersect_probe.py --tiles 512 --iters 32   # TPU timing

Results go in RESULTS.md / CLAUDE.md per VERDICT round-1 item 1.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
T = 2048          # rays per tile
SB = 128          # spheres per matmul block
INT_MAX = np.int32(0x7FFFFFFF)
IDX_MASK = np.int32(1023)
KEY_MASK = np.int32(~1023)


def _setup(device: str):
    import jax
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    return jax


# ---------------------------------------------------------------------------
# Scene + ray data


def make_inputs(jax, tiles: int, seed: int = 7):
    import jax.numpy as jnp
    from rays1bench_tpu.scene.builders import create_large_scene
    from rays1bench_tpu.kernels.pipeline import prepare_trimmed
    from rays1bench_tpu.kernels.megakernel import _pack_spheres

    scene = create_large_scene(1280.0 / 720.0)
    n_real = int(np.asarray(scene.spheres.radius != 0.0).sum())
    spheres, _ = prepare_trimmed(scene.spheres, unroll=256,
                                 cull="sort_trim", n_real=n_real)
    S = spheres.count
    assert S % SB == 0, S

    packed = _pack_spheres(spheres)          # (7, S) for the VPU kernel

    # MXU feature matrix A (S, 8): [Cx, Cy, Cz, |C|^2 - rsq, 1, 0, 0, 0].
    # rsq poisoned to -1e30 on placeholders (same trick as _pack_spheres).
    rsq = jnp.where(spheres.valid > 0.0, spheres.radius_sq, -1e30)
    csq = (spheres.center_x ** 2 + spheres.center_y ** 2
           + spheres.center_z ** 2)
    A = jnp.stack([spheres.center_x, spheres.center_y, spheres.center_z,
                   csq - rsq, jnp.ones((S,), jnp.float32),
                   jnp.zeros((S,), jnp.float32),
                   jnp.zeros((S,), jnp.float32),
                   jnp.zeros((S,), jnp.float32)], axis=1)

    # Payload matrix P (8, S): [cx, cy, cz, rsq(real), ivr, alb, mtp, 0].
    P = jnp.stack([spheres.center_x, spheres.center_y, spheres.center_z,
                   spheres.radius_sq, spheres.inv_radius,
                   packed[5], packed[6],
                   jnp.zeros((S,), jnp.float32)], axis=0)

    # Random rays: origins near the camera, unit directions into the scene.
    rng = np.random.default_rng(seed)
    n = tiles * T
    o = rng.normal(0.0, 2.0, (3, n)).astype(np.float32)
    o[1] += 2.0
    d = rng.normal(0.0, 1.0, (3, n)).astype(np.float32)
    d[1] -= 0.3
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    flat = lambda a: jnp.asarray(a.reshape(tiles, 1, T))
    plan = lambda a: jnp.asarray(a.reshape(tiles * (T // LANES), LANES))
    rays_flat = tuple(flat(x) for x in (*o, *d))      # for the MXU kernel
    rays_plane = tuple(plan(x) for x in (*o, *d))     # for the VPU kernel
    return spheres, packed, A, P, rays_flat, rays_plane, S


# ---------------------------------------------------------------------------
# Kernel X: the current VPU running-min sweep, isolated (no scatter/bounce).


def vpu_kernel(sph_smem, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               acc_ref, *, num_spheres, iters, unroll, tmin):
    import jax
    import jax.numpy as jnp
    sub = T // LANES
    _INF = np.float32(np.inf)
    tmin_c = np.float32(tmin)

    def one_iter(it, acc):
        # Perturb per iteration so nothing hoists out of the loop.
        eps = it.astype(jnp.float32) * np.float32(1e-9)
        ox, oy, oz = ox_ref[...] + eps, oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]

        def one_sphere(s, carry):
            bt = carry
            scx = sph_smem[0, s]
            scy = sph_smem[1, s]
            scz = sph_smem[2, s]
            rsq = sph_smem[3, s]
            cox = scx - ox
            coy = scy - oy
            coz = scz - oz
            nb = cox * dx + coy * dy + coz * dz
            c = cox * cox + coy * coy + coz * coz - rsq
            disc = nb * nb - c
            sq = jnp.sqrt(disc)
            t1 = nb - sq
            t2 = nb + sq
            t = jnp.where(t1 > tmin_c, t1, t2)
            better = (t < bt) & (t > tmin_c)
            return jnp.where(better, t, bt)

        def group(g, carry):
            s0 = g * unroll
            for k in range(unroll):
                carry = one_sphere(s0 + k, carry)
            return carry

        bt = jax.lax.fori_loop(0, num_spheres // unroll, group,
                               jnp.full((sub, LANES), _INF, jnp.float32))
        return acc + jnp.where(bt < np.float32(3e38), bt, 0.0)

    acc_ref[...] = jax.lax.fori_loop(
        0, iters, one_iter, jnp.zeros((sub, LANES), jnp.float32))


# ---------------------------------------------------------------------------
# Kernel Y: MXU matmul discriminants + bitcast argmin + one-hot gather.


def mxu_kernel(A_ref, P_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               acc_ref, rhs_ref, *, num_spheres, iters, tmin, mode="full"):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    tmin_c = np.float32(tmin)
    nblk = num_spheres // SB
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, T), 0)

    # Constant rhs rows (set once): row 3 is 0 for the nb half, 1 for the c
    # half; rows 5-7 are zero everywhere.
    rhs_ref[3:4, 0:T] = jnp.zeros((1, T), jnp.float32)
    rhs_ref[3:4, T:2 * T] = jnp.ones((1, T), jnp.float32)
    rhs_ref[5:8, :] = jnp.zeros((3, 2 * T), jnp.float32)

    def one_iter(it, acc):
        eps = it.astype(jnp.float32) * np.float32(1e-9)
        ox, oy, oz = ox_ref[0] + eps, oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        odot = ox * dx + oy * dy + oz * dz
        osq = ox * ox + oy * oy + oz * oz

        # rhs (8, 2T): [:T] -> nb columns, [T:] -> c columns.
        rhs_ref[0:1, 0:T] = dx
        rhs_ref[1:2, 0:T] = dy
        rhs_ref[2:3, 0:T] = dz
        rhs_ref[4:5, 0:T] = -odot
        rhs_ref[0:1, T:2 * T] = np.float32(-2.0) * ox
        rhs_ref[1:2, T:2 * T] = np.float32(-2.0) * oy
        rhs_ref[2:3, T:2 * T] = np.float32(-2.0) * oz
        rhs_ref[4:5, T:2 * T] = osq
        rhs = rhs_ref[...]

        if mode == "mm":  # matmuls only (cheap consume to defeat DCE)
            out = jnp.zeros((1, T), jnp.float32)
            for b in range(nblk):
                Ab = A_ref[b * SB:(b + 1) * SB, :]
                M = jnp.dot(Ab, rhs, preferred_element_type=jnp.float32)
                out = out + M[0:1, 0:T] + M[0:1, T:2 * T]
            return acc + out

        best = jnp.full((1, T), INT_MAX, jnp.int32)
        for b in range(nblk):
            Ab = A_ref[b * SB:(b + 1) * SB, :]
            M = jnp.dot(Ab, rhs, preferred_element_type=jnp.float32)
            nb = M[:, 0:T]
            c = M[:, T:2 * T]
            disc = nb * nb - c
            sq = jnp.sqrt(disc)              # NaN on miss (disc < 0)
            t1 = nb - sq
            t2 = nb + sq
            t = jnp.where(t1 > tmin_c, t1, t2)
            key = (pltpu.bitcast(t, jnp.int32) & KEY_MASK) | \
                (row_iota + np.int32(b * SB))
            key = jnp.where(t > tmin_c, key, INT_MAX)  # NaN -> False -> MAX
            best = jnp.minimum(best, jnp.min(key, axis=0, keepdims=True))

        sidx = best & IDX_MASK
        hit = best != INT_MAX
        if mode == "nogather":  # matmuls + key epilogue, no payload gather
            return acc + jnp.where(hit, sidx.astype(jnp.float32), 0.0)

        pay = jnp.zeros((8, T), jnp.float32)
        for b in range(nblk):
            mask = (row_iota + np.int32(b * SB) == sidx).astype(jnp.float32)
            Pb = P_ref[:, b * SB:(b + 1) * SB]
            pay = pay + jnp.dot(Pb, mask, preferred_element_type=jnp.float32)

        # Exact t recompute with the reference co = C - o formulation: output
        # matches the VPU sweep bitwise whenever the argmin picked the same
        # sphere.
        gcx, gcy, gcz = pay[0:1, :], pay[1:2, :], pay[2:3, :]
        grsq = pay[3:4, :]
        cox = gcx - ox
        coy = gcy - oy
        coz = gcz - oz
        nb1 = cox * dx + coy * dy + coz * dz
        c1 = cox * cox + coy * coy + coz * coz - grsq
        sq1 = jnp.sqrt(nb1 * nb1 - c1)
        t1 = nb1 - sq1
        tex = jnp.where(t1 > tmin_c, t1, nb1 + sq1)
        # Re-derive validity from the EXACT recompute: a matmul-rounded
        # disc > 0 can be a true miss near grazing (exact disc < 0 -> NaN).
        hit = hit & (tex > tmin_c)
        return acc + jnp.where(hit, tex, 0.0)

    acc_ref[0] = jax.lax.fori_loop(
        0, iters, one_iter, jnp.zeros((1, T), jnp.float32))


# ---------------------------------------------------------------------------
# Harness


def build_calls(jax, S, tiles, iters, interpret, mode="full"):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sub = T // LANES
    plane_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    vpu = pl.pallas_call(
        functools.partial(vpu_kernel, num_spheres=S, iters=iters,
                          unroll=256, tmin=0.001),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((7, S), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [plane_spec] * 6,
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * sub, LANES), jnp.float32),
        interpret=interpret,
    )

    mxu = pl.pallas_call(
        functools.partial(mxu_kernel, num_spheres=S, iters=iters, tmin=0.001,
                          mode=mode),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [flat_spec] * 6,
        out_specs=flat_spec,
        out_shape=jax.ShapeDtypeStruct((tiles, 1, T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2 * T), jnp.float32)],
        interpret=interpret,
    )
    return jax.jit(vpu), jax.jit(mxu)


def timed(fn, args, runs=3):
    out = fn(*args)
    float(np.asarray(out).sum())  # compile + warm
    best = None
    for i in range(runs):
        salt = (args[1] + (i + 1) * 1e-9,)  # perturb oy: defeat result cache
        a = (args[0],) + salt + args[2:]
        t0 = time.perf_counter()
        out = fn(*a)
        s = float(np.asarray(out).sum())
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="CPU interpret-mode parity check")
    ap.add_argument("--tiles", type=int, default=512)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--mode", default="full",
                    choices=("full", "nogather", "mm"),
                    help="MXU kernel breakdown: mm = matmuls only, "
                         "nogather = + key epilogue, full = + payload "
                         "gather + exact recompute")
    args = ap.parse_args()

    device = "cpu" if args.check else "tpu"
    jax = _setup(device)
    tiles = 2 if args.check else args.tiles
    iters = 2 if args.check else args.iters

    spheres, packed, A, P, rays_flat, rays_plane, S = make_inputs(jax, tiles)
    vpu, mxu = build_calls(jax, S, tiles, iters, interpret=args.check,
                           mode="full" if args.check else args.mode)

    if args.check:
        accv = np.asarray(vpu(packed, *rays_plane)).reshape(-1)
        accm = np.asarray(mxu(A, P, *rays_flat)).reshape(-1)
        diff = np.abs(accv - accm)
        rel = diff / np.maximum(np.abs(accv), 1e-3)
        nbad = int((rel > 1e-4).sum())
        print(f"check: n={accv.size} max_rel={rel.max():.3e} "
              f"mismatched(>1e-4)={nbad} "
              f"exact={int((accv == accm).sum())}/{accv.size}")
        assert nbad <= accv.size * 0.001, "MXU intersect disagrees with VPU"
        print("OK")
        return

    n_elems = tiles * iters * T * S
    dt_v, sv = timed(vpu, (packed,) + rays_plane)
    print(f"VPU sweep : {dt_v * 1e3:9.2f} ms  "
          f"{n_elems / dt_v / 1e9:8.2f} Gtests/s  "
          f"({dt_v / (tiles * iters) * 1e6:6.2f} us/tile-iter)  sum={sv:.1f}")
    dt_m, sm = timed(mxu, (A, P) + rays_flat)
    print(f"MXU {args.mode:>8}: {dt_m * 1e3:7.2f} ms  "
          f"{n_elems / dt_m / 1e9:8.2f} Gtests/s  "
          f"({dt_m / (tiles * iters) * 1e6:6.2f} us/tile-iter)  sum={sm:.1f}")
    print(f"speedup: {dt_v / dt_m:.2f}x   "
          f"(tiles={tiles} iters={iters} T={T} S={S} SB={SB})")


if __name__ == "__main__":
    main()
