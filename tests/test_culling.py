"""Sort-trim metadata tests (kernels/culling.py): Morton ordering. (The
chunk-bounds culled intersector was measured out on both the 512-row large
and 4096-row giant scenes and removed — megakernel._make_intersect
docstring, records/culling.txt.)"""

import numpy as np

from rays1bench_tpu.kernels import culling


def _random_spheres(n, seed=0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-10, 10, n).astype(np.float32)
    cy = rng.uniform(-2, 2, n).astype(np.float32)
    cz = rng.uniform(-10, 10, n).astype(np.float32)
    r = rng.uniform(0.1, 1.0, n).astype(np.float32)
    return cx, cy, cz, r


def test_morton_order_is_permutation_placeholders_last():
    cx, cy, cz, r = _random_spheres(60)
    r[50:] = 0.0  # placeholders
    valid = r != 0
    perm = culling.morton_order(cx, cy, cz, valid)
    assert sorted(perm.tolist()) == list(range(60))
    # all placeholders sort after all real spheres
    assert set(perm[50:].tolist()) == set(np.nonzero(~valid)[0].tolist())


def test_morton_order_groups_spatially():
    """Neighbors in sorted order should usually be spatial neighbors: mean
    consecutive distance must shrink vs random order."""
    cx, cy, cz, r = _random_spheres(256, seed=3)
    valid = r != 0
    perm = culling.morton_order(cx, cy, cz, valid)

    def mean_step(order):
        p = np.stack([cx[order], cy[order], cz[order]], 1)
        return np.linalg.norm(np.diff(p, axis=0), axis=1).mean()

    assert mean_step(perm) < 0.5 * mean_step(np.arange(256))


def test_giant_scene_all_engines_match_xla():
    """The 4096-sphere stress scene (builders.create_giant_scene — 8.5x the
    reference's largest; no reference analog) renders through the megakernel
    matching the dense-XLA pipeline to the documented 8-bit albedo
    quantization, with EXACT ray counts, under both sort_trim and raw row
    order."""
    import functools
    import jax
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels import pipeline as kp
    from rays1bench_tpu.render.pipeline import render_image
    from rays1bench_tpu.scene.builders import create_giant_scene

    cfg = RenderConfig(width=48, height=24, spp=1, max_bounces=3,
                       early_exit=False, ray_chunk=2048)
    scene = create_giant_scene(cfg.aspect)
    assert scene.n_real == 4096
    camera = scene.camera.build()
    ref, n_ref = render_image(scene.spheres, camera, cfg)

    origs = (kp.trace_pallas, kp.trace_pallas_wavefront)
    kp._render_jit._clear_cache()
    try:
        kp.trace_pallas = functools.partial(origs[0], interpret=True)
        kp.trace_pallas_wavefront = functools.partial(origs[1],
                                                      interpret=True)
        for cull in ("sort_trim", "none"):
            img, n = kp.render_image_pallas(
                scene.spheres, camera, cfg, tile_rays=512, unroll=64,
                cull=cull, n_real=scene.n_real)
            assert int(n) == int(n_ref), cull
            # max_bounces x 0.5/255 albedo quantization bound
            d = np.abs(np.asarray(img) - np.asarray(ref)).max()
            assert d < 8e-3, (cull, d)
    finally:
        kp.trace_pallas, kp.trace_pallas_wavefront = origs
        kp._render_jit._clear_cache()
