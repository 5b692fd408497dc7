"""Scaling sweep: rays/s vs device count.

BASELINE target: > 60% linear scaling 1 chip -> v5e-16. Real multi-chip
hardware isn't present in this environment, so the sweep runs on whatever
mesh is available (virtual CPU devices for CI; real chips when on a pod
slice). Rendering is embarrassingly parallel with the scene replicated — the
only cross-device traffic is the psum'd ray counter — so measured efficiency
on real hardware is limited by per-chip underutilization at small shards, not
communication (SURVEY.md §7.3).

Usage (virtual 8-device CPU mesh; the pallas engine needs --interpret there):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m rays1bench_tpu.bench.scaling --scene medium --spp 4 \
        --cpu --interpret [--engine xla]
"""

from __future__ import annotations

import argparse
import time
from typing import List

import jax

from rays1bench_tpu.utils.metrics import ScalingPoint, scaling_efficiency


def sweep(scene_name: str, cfg, device_counts: List[int],
          runs: int = 2, engine: str = "pallas",
          interpret: bool = False, respawn: bool = False,
          telemetry: bool = False):
    """Returns List[ScalingPoint]; with telemetry=True (pallas engine
    only), also a parallel list of per-device dicts from
    parallel.shard.render_image_pallas_sharded(telemetry=True) — the
    per-chip ray/step counters behind each point (the reference's
    per-thread counters, rayweek1.cpp:809-813)."""
    # Imported here: pulling in the scene/renderer modules initializes the
    # JAX backend (pytree registration touches it), which must happen AFTER
    # any jax_platforms override in main().
    from rays1bench_tpu.parallel.mesh import make_mesh
    from rays1bench_tpu.parallel.shard import (render_image_pallas_sharded,
                                               render_image_sharded)
    from rays1bench_tpu.scene import builders
    scene = builders.SCENES[scene_name](cfg.aspect)
    camera = scene.camera.build()
    assert not (telemetry and engine != "pallas"), \
        "telemetry rides the Pallas kernels' step counters"
    if engine == "pallas":
        # The production multi-chip path: megakernel under shard_map.
        n_real = getattr(scene, "n_real", None) or None
        render = (lambda sph, cam, cf, mesh:
                  render_image_pallas_sharded(sph, cam, cf, mesh,
                                              n_real=n_real,
                                              respawn=respawn,
                                              interpret=interpret))
    else:
        render = render_image_sharded
    points = []
    telems = []
    for nd in device_counts:
        mesh = make_mesh(nd)
        img, num = render(scene.spheres, camera, cfg, mesh)
        float(img.sum())  # compile + sync
        best = float("inf")
        for i in range(runs):
            import dataclasses
            sph = dataclasses.replace(
                scene.spheres, center_x=scene.spheres.center_x + (i + 1) * 1e-7)
            t0 = time.perf_counter()
            img, num = render(sph, camera, cfg, mesh)
            float(img.sum())
            best = min(best, time.perf_counter() - t0)
        points.append(ScalingPoint(nd, int(num), best))
        if telemetry:
            import numpy as _np
            _, _, tl = render_image_pallas_sharded(
                scene.spheres, camera, cfg, mesh,
                n_real=getattr(scene, "n_real", None) or None,
                respawn=respawn, interpret=interpret, telemetry=True)
            telems.append({k: _np.asarray(v).reshape(-1).tolist()
                           for k, v in tl.items()})
    if telemetry:
        return points, telems
    return points


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="medium")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=200)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=10)
    ap.add_argument("--devices", default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--engine", default="pallas", choices=["pallas", "xla"],
                    help="pallas = production megakernel-under-shard_map "
                         "path; xla = pure-XLA sharded pipeline")
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas engine in interpreter mode "
                         "(required on the CPU backend)")
    ap.add_argument("--respawn", action="store_true",
                    help="use the persistent-lane sample-respawn engine "
                         "(pallas engine only)")
    ap.add_argument("--telemetry", action="store_true",
                    help="also collect per-DEVICE ray/step counters "
                         "(parallel.shard telemetry=True) and print/record "
                         "them per point — the load-imbalance signal")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env pins the TPU plugin; "
                         "combine with XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=N for an N-device virtual mesh)")
    ap.add_argument("--record", default="",
                    help="write 'label|devices|seconds|rays|mrays|eff|' "
                         "lines to this file — the source for RESULTS.md's "
                         "__RESULTS_SCALING__ table "
                         "(bench/report_cli.scaling_table)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    n = len(jax.devices())
    req = [int(x) for x in args.devices.split(",") if x]
    if req and max(req) > n:
        raise SystemExit(f"requested more devices than available ({n})")
    counts = ([int(x) for x in args.devices.split(",") if x]
              or [c for c in (1, 2, 4, 8, 16) if c <= n])
    from rays1bench_tpu.core.config import RenderConfig
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_bounces=args.max_bounces, ray_chunk=16384)
    out = sweep(args.scene, cfg, counts, runs=args.runs,
                engine=args.engine, interpret=args.interpret,
                respawn=args.respawn, telemetry=args.telemetry)
    points, telems = out if args.telemetry else (out, None)
    effs = scaling_efficiency(points)
    print(f"{'devices':>8} {'mrays/s':>10} {'efficiency':>10}")
    for i, (p, e) in enumerate(zip(points, effs)):
        print(f"{p.n_devices:>8} {p.mrays:>10.2f} {e:>10.2%}")
        if telems:
            t = telems[i]
            print(f"         per-device rays  {t['device_rays']}")
            print(f"         per-device steps {t['device_iters']}")
    if args.record:
        import os
        os.makedirs(os.path.dirname(args.record) or ".", exist_ok=True)
        backend = jax.devices()[0].platform
        label = (f"{args.scene} {args.width}x{args.height} @ {args.spp} spp, "
                 f"{args.engine}{' respawn' if args.respawn else ''}"
                 f"{' (interpret)' if args.interpret else ''}, {backend}")
        with open(args.record, "a") as f:
            for i, (p, e) in enumerate(zip(points, effs)):
                f.write(f"{label}|{p.n_devices}|{p.elapsed_seconds:.4f}s|"
                        f"{p.num_rays}|{p.mrays:.3f}|{e:.3f}|\n")
                if telems:
                    # Comment row (no pipe fields): report_cli's
                    # scaling_table skips it; humans and probes read it.
                    t = telems[i]
                    f.write(f"# per-device rays {t['device_rays']} "
                            f"steps {t['device_iters']}\n")


if __name__ == "__main__":
    main()
