#!/usr/bin/env python3
"""Speed-of-light decomposition for the respawn engine across scene sizes
(round-3 verdict item 7: large is characterized at ~96% of its sweep
ceiling; what bounds medium and small?).

Method: the respawn kernel's per-tile while counter (debug_iters) counts
STEPS (bounce+respawn updates) executed per tile; grid steps run serially,
so per-step cost = wall time / total steps. Measuring that cost at the
production configuration of each scene (sphere rows S = 8 / 64 / 512 after
sort_trim, production unroll) and fitting

    t_step(S) = a + b * S

decomposes every scene's step into the SPHERE SWEEP (b * S — the
reference's hot loop, rayweek1.cpp:190-226) and the FIXED per-step work
(a — scatter + RNG + sky + the in-register respawn raygen, which this
kernel executes unconditionally every step). The sweep share b*S/(a+b*S)
is each scene's distance from its own speed of light: where it is small,
faster intersection buys nothing — the scene is bound by per-bounce
shading/raygen ALU, not by intersection.

spp is scaled per scene so every timed dispatch is >= ~0.4 s (the ~29 ms
tunnel round trip stays < 10%).

Usage: python tools/ceiling_probe.py [--record records/ceiling.txt]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE_SPP = {"small": 1000, "medium": 250, "large": 250}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+",
                    default=["small", "medium", "large"])
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--max-bounces", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--record", default="")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import dataclasses as _dc
    import jax.numpy as jnp
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.megakernel import trace_pallas_respawn
    from rays1bench_tpu.kernels.pipeline import (_tile_coords, _tile_order,
                                                 auto_sync_every,
                                                 prepare_trimmed)
    from rays1bench_tpu.scene import builders

    rows = []
    for name in args.scenes:
        cfg = RenderConfig(width=1280, height=720, spp=SCENE_SPP[name],
                           max_bounces=args.max_bounces)
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        spheres, unroll = prepare_trimmed(scene.spheres, 0, "sort_trim",
                                          scene.n_real)
        cfgp = cfg.replace(spp=1)
        ids_np, _, _, _, geom = _tile_order(cfg.width, cfg.height, 1,
                                            args.tile)
        pid, x, y = _tile_coords(cfgp, geom, len(ids_np))
        sync = auto_sync_every(spheres.count, respawn=True)

        def run(salt):
            sph = _dc.replace(spheres,
                              center_x=spheres.center_x + salt)
            (rr, rg, rb), nr, iters, _ = trace_pallas_respawn(
                sph, camera, pid, x, y, cfg, tile_lanes=args.tile,
                unroll=unroll, sync_every=sync, debug_iters=True,
                num_pixels=cfg.num_pixels)
            return float(rr.sum()), int(nr), np.asarray(iters)

        _, nrays, iters = run(0.0)  # compile + the step counts
        best = None
        for i in range(args.runs):
            t0 = time.perf_counter()
            _, nr_i, _ = run((i + 1) * 1e-7)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        total_steps = int(iters.sum())
        t_step = best / total_steps
        rows.append((name, spheres.count, unroll, best, nrays, total_steps,
                     t_step))
        print(f"{name}: S={spheres.count} unroll={unroll} sync={sync} "
              f"spp={cfg.spp} time={best:.3f}s rays={nrays} "
              f"tile_steps={total_steps} t_step={t_step * 1e6:.3f} us "
              f"({nrays / best / 1e6:.1f} mrays/s)", flush=True)

    if len(rows) >= 2:
        S = np.array([r[1] for r in rows], np.float64)
        T = np.array([r[6] for r in rows], np.float64) * 1e6  # us
        A = np.stack([np.ones_like(S), S], 1)
        (a, b), *_ = np.linalg.lstsq(A, T, rcond=None)
        print(f"\nfit: t_step = {a:.3f} us + {b * 1e3:.3f} ns * S "
              f"(residual {np.abs(A @ np.array([a, b]) - T).max():.3f} us)")
        for name, s, _, _, _, _, ts in rows:
            sweep = b * s
            share = sweep / (a + sweep)
            print(f"  {name:7s}: sweep {sweep:7.3f} us vs fixed {a:.3f} us "
                  f"-> sweep share {share * 100:5.1f}%  "
                  f"(measured t_step {ts * 1e6:.3f} us)")

    if args.record:
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        with open(args.record, "a") as f:
            for name, s, unroll, bestt, nrays, steps, ts in rows:
                f.write(f"{name} S={s} spp={SCENE_SPP[name]} "
                        f"mb{args.max_bounces}|{bestt:.3f}s|{nrays}|"
                        f"{steps} steps|{ts * 1e6:.3f} us/step|\n")


if __name__ == "__main__":
    main()
