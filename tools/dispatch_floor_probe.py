#!/usr/bin/env python3
"""Measure the remote runtime's per-dispatch latency floor and whether
back-to-back async dispatches pipeline (hiding the round trip).

Usage: python tools/dispatch_floor_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rays1bench_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return x * 1.000001 + 1.0

    x = jnp.ones((8, 128), jnp.float32)
    float(tiny(x).sum())
    # serial with readback each time
    ts = []
    for i in range(5):
        x = x + i
        t0 = time.perf_counter()
        float(tiny(x).sum())
        ts.append(time.perf_counter() - t0)
    print(f"tiny serial w/ readback: {[round(t*1e3,2) for t in ts]}ms")

    # pipelined: N dispatches, one readback at the end
    for n in (1, 2, 5, 10):
        x = x + 1
        t0 = time.perf_counter()
        outs = []
        y = x
        for i in range(n):
            y = tiny(y)
            outs.append(y)
        float(outs[-1].sum())
        dt = time.perf_counter() - t0
        print(f"tiny pipelined n={n}: total={dt*1e3:.2f}ms "
              f"per_dispatch={dt/n*1e3:.2f}ms")

    # now with a real render: large scene, pipelined frames
    import dataclasses as _dc
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.scene import builders

    for name in ("small", "medium", "large"):
        cfg = RenderConfig(width=1280, height=720, spp=4, max_bounces=10)
        scene = builders.SCENES[name](cfg.aspect)
        camera = scene.camera.build()
        img, nrays = render_image_pallas(scene.spheres, camera, cfg,
                                         n_real=scene.n_real)
        float(img.sum())
        for n in (1, 4):
            sphs = [_dc.replace(scene.spheres,
                                center_x=scene.spheres.center_x + (i + 1) * 1e-7)
                    for i in range(n)]
            t0 = time.perf_counter()
            outs = [render_image_pallas(s, camera, cfg, n_real=scene.n_real)
                    for s in sphs]
            tot = sum(float(im.sum()) for im, _ in outs)
            dt = time.perf_counter() - t0
            rays = sum(int(r) for _, r in outs)
            print(f"{name} pipelined n={n}: total={dt*1e3:.1f}ms "
                  f"per_frame={dt/n*1e3:.1f}ms -> {rays/dt/1e6:.1f} mrays/s",
                  flush=True)


if __name__ == "__main__":
    main()
