"""Pallas closest-hit-index kernel tests (kernels/intersect_pallas.py):
the accelerated differentiable path must match the XLA pipeline bitwise in
both forward values and gradients (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.grad.inverse import image_loss, params_of
from rays1bench_tpu.render.pipeline import render_image
from rays1bench_tpu.scene.builders import create_small_scene, create_medium_scene

CFG = RenderConfig(width=64, height=32, spp=2, max_bounces=5, ray_chunk=4096,
                   seed=9, early_exit=False)


def test_forward_bitwise_identical():
    for builder in (create_small_scene, create_medium_scene):
        scene = builder(CFG.aspect)
        cam = scene.camera.build()
        a, na = render_image(scene.spheres, cam, CFG)
        b, nb = render_image(scene.spheres, cam,
                             CFG.replace(pallas_intersect=True))
        assert int(na) == int(nb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_bitwise_identical():
    scene = create_small_scene(CFG.aspect)
    cam = scene.camera.build()
    params = params_of(scene.spheres, ("center_x", "radius", "albedo_x"))
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    ga = jax.grad(image_loss)(params, scene.spheres, cam, target, CFG)
    gb = jax.grad(image_loss)(params, scene.spheres, cam, target,
                              CFG.replace(pallas_intersect=True))
    for k in ga:
        np.testing.assert_array_equal(np.asarray(ga[k]), np.asarray(gb[k]))


def test_padding_rays_handled():
    """Ray counts not divisible by the kernel tile are padded internally."""
    from rays1bench_tpu.kernels.intersect_pallas import closest_hit_index
    from rays1bench_tpu.scene.spheres import prepare
    scene = create_small_scene(CFG.aspect)
    prep = prepare(scene.spheres)
    n = 777  # deliberately awkward
    z = jnp.zeros((n,), jnp.float32)
    o = jnp.ones((n,), jnp.float32)
    idx, hit = closest_hit_index(prep, z, z, z + 2.0, z, z, -o, 1e-3, 2048,
                                 True)
    assert idx.shape == (n,) and hit.shape == (n,)
    assert bool(hit.all())  # camera axis through the scene hits something
