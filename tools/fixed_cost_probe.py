#!/usr/bin/env python3
"""Per-block cost of the respawn kernel's FIXED per-step work on real TPU.

records/ceiling.txt decomposes the respawn engine as t_step = a + b * S
with a = 0.466 us of fixed work (scatter + RNG + raygen + sky + state
bookkeeping) — ~80% of every step on the small scene, ~33% on medium
(round-4 verdict weak item 1). Before optimizing any of it, this probe
prices the individual blocks: a Pallas kernel iterates ONE block K times
per tile on production-shaped (16, 128) planes (inputs derived from the
carried accumulator so nothing hoists or folds; outputs folded back in so
nothing DCEs), and per-iteration cost falls out of the wall time after
subtracting the measured carry/loop baseline.

Blocks:
  baseline  carry mixing only (the harness overhead all rows subtract)
  hash      one hash_bits draw (the PCG chain every RNG draw pays)
  ball      in_unit_ball (scatter's 2-hash + sincos sample)
  disk      in_unit_disk (raygen's lens sample)
  sincos    bare jnp.cos + jnp.sin pair
  raygen    the respawn make_ray: jitter + lens + camera math + normalize
  raygen_arith  camera math + normalize only (no RNG, no disk)
  scatter   render/materials.scatter on a synthetic HitRecord
  sky       sky_color + 3 masked adds (the miss block)
  sweep8    an 8-sphere intersect sweep (scale reference: b * 8)

Usage: python tools/fixed_cost_probe.py [--iters 4096] [--tiles 64]
           [--record records/fixed_cost.txt]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
SUB = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--blocks", nargs="+", default=[])
    ap.add_argument("--record", default="")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.render.integrator import sky_color
    from rays1bench_tpu.render.intersect import HitRecord
    from rays1bench_tpu.render.materials import scatter
    from rays1bench_tpu.kernels.megakernel import (_cam_from_smem,
                                                   _make_intersect,
                                                   _pack_camera)
    from rays1bench_tpu.scene.builders import create_small_scene
    from rays1bench_tpu.scene.spheres import prepare

    seed = np.uint32(5)
    scene = create_small_scene(16 / 9, pad_multiple=8)
    camera = scene.camera.build()
    camp = np.asarray(_pack_camera(camera))
    spheres = prepare(scene.spheres)
    from rays1bench_tpu.kernels.megakernel import _pack_spheres
    packed = np.asarray(_pack_spheres(spheres))

    def mk_block(name):
        """block(i, a, b, c, rid) -> (da, db, dc): three planes folded into
        the carry. a/b/c are bounded float planes; rid an int32 plane."""
        def _ray_from(a, b, c):
            # A plausibly-normalized direction from the carry planes.
            inv = jax.lax.rsqrt(a * a + b * b + c * c + 1e-3)
            return a * inv, b * inv, c * inv

        if name == "baseline":
            def blk(i, a, b, c, rid, cam):
                return a * 0.5 + 0.1, b, c
        elif name == "hash":
            def blk(i, a, b, c, rid, cam):
                u = rng_mod.uniform01(seed, rid, i, 3)
                return u, b, c
        elif name == "ball":
            def blk(i, a, b, c, rid, cam):
                x, y, z = rng_mod.in_unit_ball(seed, rid, i, 8)
                return x, y, z
        elif name == "disk":
            def blk(i, a, b, c, rid, cam):
                x, y = rng_mod.in_unit_disk(seed, rid, i, 2)
                return x, y, c
        elif name == "sincos":
            def blk(i, a, b, c, rid, cam):
                return jnp.cos(a), jnp.sin(a), c
        elif name in ("raygen", "raygen_arith"):
            def blk(i, a, b, c, rid, cam, arith=(name == "raygen_arith")):
                if arith:
                    ju = a * 0.5
                    jv = b * 0.5
                    rdx = c * 0.1
                    rdy = a * 0.1
                else:
                    ju, jv = rng_mod.pixel_jitter(seed, rid)
                    rdx, rdy = rng_mod.in_unit_disk(seed, rid,
                                                    jnp.int32(-1),
                                                    rng_mod.Slots.LENS_U)
                rdx = rdx * cam.lens_radius
                rdy = rdy * cam.lens_radius
                s = (a * 64.0 + ju) * np.float32(1.0 / 200.0)
                t = (b * 32.0 + jv) * np.float32(1.0 / 100.0)
                ox = cam.origin[0] + cam.u[0] * rdx + cam.v[0] * rdy
                oy = cam.origin[1] + cam.u[1] * rdx + cam.v[1] * rdy
                oz = cam.origin[2] + cam.u[2] * rdx + cam.v[2] * rdy
                dx = cam.lower_left[0] + s * cam.horizontal[0] \
                    + t * cam.vertical[0] - ox
                dy = cam.lower_left[1] + s * cam.horizontal[1] \
                    + t * cam.vertical[1] - oy
                dz = cam.lower_left[2] + s * cam.horizontal[2] \
                    + t * cam.vertical[2] - oz
                inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
                return dx * inv + ox * 1e-6, dy * inv + oy * 1e-6, \
                    dz * inv + oz * 1e-6
        elif name == "scatter":
            def blk(i, a, b, c, rid, cam):
                dx, dy, dz = _ray_from(a, b, c)
                nx, ny, nz = _ray_from(b, c, a)
                mt = jnp.clip(rid, 0, 2)
                rec = HitRecord(hit=a > -2.0, t=a + 1.5, px=a, py=b, pz=c,
                                nx=nx, ny=ny, nz=nz, mat_type=mt,
                                albedo_x=0.5 + 0.3 * a,
                                albedo_y=0.5 + 0.3 * b,
                                albedo_z=0.5 + 0.3 * c,
                                fuzz=0.2 + 0.1 * a,
                                ref_idx=1.5 + 0.1 * b)
                (sx, sy, sz), (mr, mg, mb), ok = scatter(dx, dy, dz, rec,
                                                         seed, rid, i)
                return sx + mr * 1e-6, sy + mg * 1e-6, \
                    sz + mb * 1e-6 + ok.astype(jnp.float32) * 1e-7
        elif name == "sky":
            def blk(i, a, b, c, rid, cam):
                dx, dy, dz = _ray_from(a, b, c)
                skr, skg, skb = sky_color(dx, dy, dz)
                miss = a > 0.0
                return (jnp.where(miss, a * skr, 0.0),
                        jnp.where(miss, b * skg, 0.0),
                        jnp.where(miss, c * skb, 0.0))
        else:
            # "sweep8" never reaches mk_block — build() handles it inline
            # (it needs the sphere SMEM ref, not just the camera).
            raise SystemExit(f"unknown block {name}")
        return blk

    def build(name):
        is_sweep = name == "sweep8"
        blk = None if is_sweep else mk_block(name)

        def kernel(cam_smem, sph_smem, out_ref):
            cam = _cam_from_smem(cam_smem)
            zero = jnp.zeros((SUB, LANES), jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
            subl = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
            rid0 = subl * LANES + lane + pl.program_id(0) * (SUB * LANES)
            if is_sweep:
                isect = _make_intersect(sph_smem, num_spheres=8,
                                        t_min=1e-3, sub=SUB, unroll=4)

            def body(i, carry):
                a, b, c = carry
                rid = rid0 + i
                if is_sweep:
                    inv = jax.lax.rsqrt(a * a + b * b + c * c + 1e-3)
                    best = isect(a, b, c + 3.0, a * inv, b * inv, c * inv)
                    da = jnp.where(best[0] < 1e30, best[0], a * 0.5)
                    db, dc = best[1] * 1e-6 + b, best[2] * 1e-6 + c
                else:
                    da, db, dc = blk(i, a, b, c, rid, cam)
                # Mix: keep planes bounded and data-dependent.
                a = jnp.clip(da * 0.5 + a * 0.25, -1.0, 1.0)
                b = jnp.clip(db * 0.5 + b * 0.25, -1.0, 1.0)
                c = jnp.clip(dc * 0.5 + c * 0.25, -1.0, 1.0)
                return a, b, c

            a0 = (lane.astype(jnp.float32) * (1.0 / 128.0) - 0.5,
                  subl.astype(jnp.float32) * (1.0 / 16.0) - 0.5,
                  zero + 0.3)
            a, b, c = jax.lax.fori_loop(0, args.iters, body, a0)
            out_ref[...] = a + b + c

        return pl.pallas_call(
            kernel,
            grid=(args.tiles,),
            in_specs=[pl.BlockSpec(camp.shape, lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(packed.shape, lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((args.tiles * SUB, LANES),
                                           jnp.float32),
        )

    names = args.blocks or ["baseline", "hash", "ball", "disk", "sincos",
                            "raygen", "raygen_arith", "scatter", "sky",
                            "sweep8"]
    total_iters = args.iters * args.tiles
    results = {}
    camp_j = jnp.asarray(camp)
    packed_j = jnp.asarray(packed)
    for name in names:
        call = jax.jit(build(name))
        out = call(camp_j, packed_j)
        float(out.sum())  # compile
        best = float("inf")
        for r in range(args.runs):
            cj = camp_j.at[0, 0].add(1e-6 * (r + 1))  # defeat run cache
            t0 = time.perf_counter()
            out = call(cj, packed_j)
            float(out.sum())
            best = min(best, time.perf_counter() - t0)
        results[name] = best / total_iters * 1e9
        base = results.get("baseline", 0.0)
        print(f"{name:14s} {results[name]:8.2f} ns/iter"
              f"  (net {results[name] - (base if name != 'baseline' else 0):8.2f})",
              flush=True)

    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        base = results.get("baseline", 0.0)
        with open(args.record, "a") as f:
            f.write(f"# fixed-cost probe, iters={args.iters} "
                    f"tiles={args.tiles} tile=(16,128)\n")
            for name in names:
                net = results[name] - (base if name != "baseline" else 0.0)
                f.write(f"{name}|{results[name]:.2f}ns|{net:.2f}ns|\n")


if __name__ == "__main__":
    main()
