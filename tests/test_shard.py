"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: distributed tests runnable on a CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.parallel.mesh import make_mesh
from rays1bench_tpu.parallel.shard import render_image_sharded
from rays1bench_tpu.render.pipeline import render_image
from rays1bench_tpu.scene.builders import create_small_scene

CFG = RenderConfig(width=64, height=40, spp=2, max_bounces=6, ray_chunk=1024)


@pytest.fixture(scope="module")
def scene_and_camera():
    scene = create_small_scene(CFG.aspect)
    return scene, scene.camera.build()


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_matches_single_device(scene_and_camera):
    """Stateless RNG + static sharding => the sharded render is numerically
    identical to the single-device one (the property the reference's
    per-thread RNG streams explicitly lack, README.md:1188)."""
    scene, camera = scene_and_camera
    ref, n_ref = render_image(scene.spheres, camera, CFG)
    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        img, n = render_image_sharded(scene.spheres, camera, CFG, mesh)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=1e-6)
        assert int(n) == int(n_ref)


def test_graft_entry_dryrun():
    """The driver's multichip dry-run path."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), os.pardir,
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    img, n = jax.jit(fn)(*args)
    assert img.shape[2] == 3
    mod.dryrun_multichip(8)


def test_high_spp_sample_sharding(scene_and_camera):
    """BASELINE config 5's shape at test scale: a high-spp render (sample
    axis folded into the ray stream) sharded over all 8 devices, ray counts
    and image identical to single-device."""
    scene, camera = scene_and_camera
    cfg = CFG.replace(width=32, height=16, spp=64, ray_chunk=4096)
    ref, n_ref = render_image(scene.spheres, camera, cfg)
    img, n = render_image_sharded(scene.spheres, camera, cfg, make_mesh(8))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)
    assert int(n) == int(n_ref)


def test_pallas_sharded_matches_single_device(scene_and_camera):
    """The production multi-chip path (megakernel under shard_map) is
    bit-identical to the single-device megakernel render."""
    import functools
    from rays1bench_tpu.kernels import pipeline as kp
    from rays1bench_tpu.parallel.shard import render_image_pallas_sharded

    scene, camera = scene_and_camera
    orig = kp.trace_pallas
    kp._render_jit._clear_cache()
    try:
        kp.trace_pallas = functools.partial(orig, interpret=True)
        ref, n_ref = kp.render_image_pallas(scene.spheres, camera, CFG,
                                            tile_rays=1024, unroll=4,
                                            n_real=scene.n_real)
    finally:
        kp.trace_pallas = orig
        kp._render_jit._clear_cache()
    for n_dev in (2, 8):
        img, n = render_image_pallas_sharded(
            scene.spheres, camera, CFG, make_mesh(n_dev),
            tile_rays=1024, unroll=4, n_real=scene.n_real, interpret=True)
        assert int(n) == int(n_ref)
        assert (np.asarray(img) == np.asarray(ref)).all()
