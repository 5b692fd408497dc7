"""Auxiliary subsystem tests: metrics, checkpoint/resume, fault retry,
scaling sweep, profiling hooks (SURVEY.md §5 coverage)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.utils.metrics import (ScalingPoint, mrays_per_sec,
                                          scaling_efficiency)
from rays1bench_tpu.utils import profiling
from rays1bench_tpu.grad import checkpoint as ckpt
from rays1bench_tpu.parallel.multihost import render_with_retry


def test_mrays_metric_definition():
    # reference: rays / seconds / 1e6 (common.h:41-44)
    assert mrays_per_sec(25_236_618, 58.601) == pytest.approx(0.4306, abs=1e-3)
    assert mrays_per_sec(100, 0.0) == 0.0


def test_scaling_efficiency():
    pts = [ScalingPoint(1, 1000, 1.0), ScalingPoint(2, 2000, 1.0),
           ScalingPoint(4, 4000, 1.25)]
    effs = scaling_efficiency(pts)
    assert effs[0] == pytest.approx(1.0)
    assert effs[1] == pytest.approx(1.0)
    assert effs[2] == pytest.approx(0.8)


def test_checkpoint_roundtrip(tmp_path):
    params = {"center_x": jnp.arange(4.0), "radius": jnp.ones(4)}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    # advance one step so the state is nontrivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ck.npz")
    ckpt.save(path, params, state, step=7)
    p2, s2, step = ckpt.restore(path, state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(p2["center_x"]),
                               np.asarray(params["center_x"]))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fit_scene_resumes(tmp_path):
    """fit_scene picks up where the checkpoint left off."""
    from rays1bench_tpu.grad.inverse import InverseConfig, fit_scene
    from rays1bench_tpu.render.camera import CameraSpec
    from rays1bench_tpu.scene.soa_spheres import SphereSOABuilder
    from rays1bench_tpu.scene.spheres import METAL

    cfg = RenderConfig(width=32, height=16, spp=1, max_bounces=2,
                       early_exit=False, seed=5)
    b = SphereSOABuilder()
    b.add(0, 0, 0, 2.0, METAL, 0.9, 0.8, 0.7, 0.0, 1.0)
    spheres = b.finalize(pad_multiple=8)
    cam = CameraSpec(lookfrom=(0, 0, 2.4), lookat=(0, 0, 0), vfov=45,
                     aspect=cfg.aspect, aperture=0.0, focus_dist=3.0).build()
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    path = str(tmp_path / "fit.npz")
    inv = InverseConfig(steps=4, optimize=("albedo_x",), learning_rate=1e-2)
    _, losses1 = fit_scene(spheres, cam, target, cfg, inv,
                           checkpoint_path=path, checkpoint_every=2)
    assert len(losses1) == 4 and os.path.exists(path)
    # resume: steps already done -> no further loss entries
    inv2 = InverseConfig(steps=6, optimize=("albedo_x",), learning_rate=1e-2)
    _, losses2 = fit_scene(spheres, cam, target, cfg, inv2,
                           checkpoint_path=path, checkpoint_every=2)
    assert len(losses2) == 2  # resumed at step 4 of 6


def test_render_with_retry_recovers():
    calls = {"n": 0}

    def flaky(ids):
        calls["n"] += 1
        if calls["n"] == 2:  # second shard fails once
            raise RuntimeError("simulated device failure")
        return ids.astype(np.float32) * 2.0

    shards = [np.arange(4), np.arange(4, 8)]
    out, retried = render_with_retry(flaky, shards)
    np.testing.assert_allclose(out, np.arange(8) * 2.0)
    assert retried == 1


def test_profiling_hooks_smoke(tmp_path):
    with profiling.annotate("test-span"):
        pass
    stats = profiling.device_memory_stats()
    assert stats is None or isinstance(stats, dict)
