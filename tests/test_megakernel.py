"""Megakernel tests (interpreter mode on CPU).

The Pallas megakernel must match the XLA wavefront integrator exactly, except
for its 8-bit albedo quantization (megakernel._pack_spheres) — so comparisons
use exact ray counts and tight-but-not-bitwise radiance tolerances on scenes
with 8-bit-exact albedos, and bitwise equality when albedos quantize exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rays1bench_tpu.core import rng as rng_mod
from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.kernels.megakernel import trace_pallas, _pack_spheres
from rays1bench_tpu.render.integrator import trace
from rays1bench_tpu.scene.builders import create_small_scene, create_medium_scene
from rays1bench_tpu.scene.spheres import prepare


def _primary_rays(cfg, scene):
    cam = scene.camera.build()
    n = cfg.num_primary_rays
    ray_id = jnp.arange(n, dtype=jnp.int32)
    pix = ray_id // cfg.spp
    x = (pix % cfg.width).astype(jnp.float32)
    y = (pix // cfg.width).astype(jnp.float32)
    seed = jnp.uint32(cfg.seed)
    ju, jv = rng_mod.pixel_jitter(seed, ray_id)
    return ray_id, cam.generate_rays((x + ju) / cfg.width,
                                     (y + jv) / cfg.height, seed, ray_id)


@pytest.mark.parametrize("builder", [create_small_scene, create_medium_scene])
def test_megakernel_matches_integrator(builder):
    cfg = RenderConfig(width=64, height=32, spp=1, max_bounces=8, seed=7)
    scene = builder(cfg.aspect)
    prep = prepare(scene.spheres)
    ray_id, rays = _primary_rays(cfg, scene)

    (ar, ag, ab), n_x = trace(prep, *rays, jnp.uint32(cfg.seed), ray_id,
                              max_bounces=cfg.max_bounces)
    (br, bg, bb), n_p = trace_pallas(prep, *rays, ray_id, cfg,
                                     tile_rays=1024, unroll=4, interpret=True)
    assert int(n_x) == int(n_p)          # identical alive/dead trajectories
    for a, b in zip((ar, ag, ab), (br, bg, bb)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        # Radiance differs only through 8-bit albedo quantization, compounded
        # over <= 9 bounces.
        assert d.max() < 0.02, d.max()
        assert d.mean() < 2e-3


def test_megakernel_padding_lanes_inactive():
    cfg = RenderConfig(width=24, height=16, spp=1, max_bounces=4, seed=3)
    scene = create_small_scene(cfg.aspect)
    prep = prepare(scene.spheres)
    ray_id, rays = _primary_rays(cfg, scene)
    # pad to one 1024-tile: 384 active + 640 padding
    pad = 1024 - cfg.num_primary_rays
    rays_p = tuple(jnp.pad(a, (0, pad)) for a in rays)
    rid_p = jnp.pad(ray_id, (0, pad), constant_values=10 ** 7)
    (rr, rg, rb), n = trace_pallas(prep, *rays_p, rid_p, cfg,
                                   tile_rays=1024, unroll=4, interpret=True)
    (er, eg, eb), n_ref = trace(prep, *rays, jnp.uint32(cfg.seed), ray_id,
                                max_bounces=cfg.max_bounces)
    assert int(n) == int(n_ref)          # padding never counted
    assert np.asarray(rr)[cfg.num_primary_rays:].sum() == 0


def test_pack_spheres_placeholder_poison():
    scene = create_small_scene(16 / 9)
    packed = np.asarray(_pack_spheres(prepare(scene.spheres)))
    assert packed.shape == (7, 128)
    # placeholder rows: radius_sq poisoned so the discriminant is always < 0
    assert (packed[3, 5:] < -1e29).all()
    # real rows keep radius_sq
    assert np.isclose(packed[3, 0], 0.25)


def test_pipeline_matches_xla_pipeline():
    from rays1bench_tpu.kernels import pipeline as kp
    from rays1bench_tpu.render.pipeline import render_image

    cfg = RenderConfig(width=64, height=32, spp=2, max_bounces=6,
                       ray_chunk=4096, seed=11)
    scene = create_small_scene(cfg.aspect)
    cam = scene.camera.build()
    ref, n_ref = render_image(scene.spheres, cam, cfg)

    # interpret path: call trace_pallas through the pipeline's permutation,
    # in every cull mode — none of them may change the image.
    import functools
    orig = kp.trace_pallas
    kp._render_jit._clear_cache()
    try:
        kp.trace_pallas = functools.partial(orig, interpret=True)
        for cull in ("none", "sort_trim"):
            img, n = kp.render_image_pallas(scene.spheres, cam, cfg,
                                            tile_rays=1024, unroll=4,
                                            cull=cull)
            assert int(n) == int(n_ref), cull
            d = np.abs(np.asarray(img) - np.asarray(ref))
            assert d.max() < 0.02 and d.mean() < 2e-3, cull
    finally:
        kp.trace_pallas = orig
        kp._render_jit._clear_cache()


@pytest.mark.parametrize("schedule", [(2, 3, 6), (1, 1, 1, 1, 1, 1, 1, 1, 1),
                                      (20,), (2, 3), (1,) * 16])
def test_wavefront_matches_oneshot_bitwise(schedule):
    """Phased + compacted tracing must be BITWISE identical per ray to the
    one-shot kernel: stateless RNG on absolute (ray_id, bounce) means lane
    placement cannot change any ray's arithmetic."""
    from rays1bench_tpu.kernels.megakernel import trace_pallas_wavefront

    cfg = RenderConfig(width=64, height=32, spp=1, max_bounces=8, seed=7)
    scene = create_medium_scene(cfg.aspect)
    prep = prepare(scene.spheres)
    ray_id, rays = _primary_rays(cfg, scene)

    (ar, ag, ab), n_a = trace_pallas(prep, *rays, ray_id, cfg,
                                     tile_rays=1024, unroll=4, interpret=True)
    (br, bg, bb), n_b = trace_pallas_wavefront(
        prep, *rays, ray_id, cfg, tile_rays=1024, unroll=4,
        schedule=schedule, interpret=True)
    assert int(n_a) == int(n_b)
    for a, b in zip((ar, ag, ab), (br, bg, bb)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_wavefront_pipeline_end_to_end():
    from rays1bench_tpu.kernels import pipeline as kp
    from rays1bench_tpu.kernels import megakernel as mk
    import functools

    cfg = RenderConfig(width=64, height=32, spp=2, max_bounces=6,
                       ray_chunk=4096, seed=11)
    scene = create_small_scene(cfg.aspect)
    cam = scene.camera.build()

    orig_one, orig_wf = kp.trace_pallas, kp.trace_pallas_wavefront
    kp._render_jit._clear_cache()
    try:
        kp.trace_pallas = functools.partial(orig_one, interpret=True)
        kp.trace_pallas_wavefront = functools.partial(orig_wf, interpret=True)
        ref, n_ref = kp.render_image_pallas(scene.spheres, cam, cfg,
                                            tile_rays=1024, unroll=4)
        img, n = kp.render_image_pallas(scene.spheres, cam, cfg,
                                        tile_rays=1024, unroll=4,
                                        wavefront=(2, 5))
        assert int(n) == int(n_ref)
        assert (np.asarray(img) == np.asarray(ref)).all()
    finally:
        kp.trace_pallas, kp.trace_pallas_wavefront = orig_one, orig_wf
        kp._render_jit._clear_cache()


@pytest.mark.parametrize("builder,spp,cull", [
    (create_small_scene, 8, "sort_trim"),
    (create_small_scene, 4, "sort_trim"),
    (create_medium_scene, 2, "none"),
])
def test_respawn_pipeline_matches_oneshot(builder, spp, cull):
    """The persistent-lane sample-respawn engine must produce EXACTLY the
    one-shot kernel's ray count (identical per-ray trajectories) and its
    pixel means up to float addition order (samples are summed serially per
    lane instead of pairwise over a materialized per-ray axis)."""
    from rays1bench_tpu.kernels import pipeline as kp
    import functools

    cfg = RenderConfig(width=64, height=32, spp=spp, max_bounces=6, seed=11)
    scene = builder(cfg.aspect)
    cam = scene.camera.build()

    orig_one, orig_resp = kp.trace_pallas, kp.trace_pallas_respawn
    kp._render_jit._clear_cache()
    try:
        kp.trace_pallas = functools.partial(orig_one, interpret=True)
        kp.trace_pallas_respawn = functools.partial(orig_resp, interpret=True)
        kw = dict(tile_rays=1024, unroll=4, cull=cull,
                  n_real=scene.n_real)
        ref, n_ref = kp.render_image_pallas(scene.spheres, cam, cfg, **kw)
        img, n = kp.render_image_pallas(scene.spheres, cam, cfg,
                                        respawn=True, **kw)
        assert int(n) == int(n_ref)
        d = np.abs(np.asarray(img) - np.asarray(ref))
        assert d.max() < 1e-5, d.max()
    finally:
        kp.trace_pallas, kp.trace_pallas_respawn = orig_one, orig_resp
        kp._render_jit._clear_cache()


def test_respawn_sync_every_invariant():
    """Overshooting dead lanes between early-exit checks must be idempotent:
    no extra counts, no extra respawns, bitwise-identical pixel sums."""
    from rays1bench_tpu.kernels.megakernel import trace_pallas_respawn
    from rays1bench_tpu.kernels.pipeline import _tile_order, _tile_coords

    cfg = RenderConfig(width=64, height=32, spp=3, max_bounces=8, seed=7)
    scene = create_medium_scene(cfg.aspect)
    prep = prepare(scene.spheres)
    cam = scene.camera.build()
    ids_np, _, _, _, geom = _tile_order(cfg.width, cfg.height, 1, 1024)
    pid, x, y = _tile_coords(cfg.replace(spp=1), geom, len(ids_np))

    (ar, ag, ab), n_a = trace_pallas_respawn(prep, cam, pid, x, y, cfg,
                                             tile_lanes=1024, unroll=4,
                                             interpret=True)
    (br, bg, bb), n_b = trace_pallas_respawn(prep, cam, pid, x, y, cfg,
                                             tile_lanes=1024, unroll=4,
                                             sync_every=3, interpret=True)
    assert int(n_a) == int(n_b)
    for a, b in zip((ar, ag, ab), (br, bg, bb)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_respawn_padding_lanes_inactive():
    """Pixel slots past the image (the inexact-tiling pad) never trace, never
    count, and leave zero radiance."""
    from rays1bench_tpu.kernels.megakernel import trace_pallas_respawn
    from rays1bench_tpu.kernels.pipeline import _tile_order, _tile_coords

    cfg = RenderConfig(width=50, height=30, spp=2, max_bounces=4, seed=3)
    scene = create_small_scene(cfg.aspect)
    prep = prepare(scene.spheres)
    cam = scene.camera.build()
    ids_np, _, _, _, geom = _tile_order(cfg.width, cfg.height, 1, 1024)
    pid, x, y = _tile_coords(cfg.replace(spp=1), geom, len(ids_np))
    assert len(ids_np) > cfg.num_pixels  # the pad is actually exercised

    (rr, rg, rb), n = trace_pallas_respawn(prep, cam, pid, x, y, cfg,
                                           tile_lanes=1024, unroll=4,
                                           interpret=True)
    pad_mask = np.asarray(pid) >= cfg.num_pixels
    assert np.asarray(rr)[pad_mask].sum() == 0
    # count matches the XLA integrator on the same (unpadded) rays
    ray_id, rays = _primary_rays(cfg, scene)
    _, n_ref = trace(prep, *rays, jnp.uint32(cfg.seed), ray_id,
                     max_bounces=cfg.max_bounces)
    assert int(n) == int(n_ref)


@pytest.mark.parametrize("w,h,spp,tile", [(64, 32, 2, 1024), (1280, 720, 4, 2048),
                                          (50, 30, 3, 1024)])
def test_tile_coords_match_numpy(w, h, spp, tile):
    """The in-jit arithmetic slot->(id,x,y) mapping (no baked constants) must
    reproduce _tile_order's numpy tables exactly, including padding lanes."""
    from rays1bench_tpu.kernels.pipeline import (_tile_order, _tile_coords,
                                                 _slot_of_id)

    cfg = RenderConfig(width=w, height=h, spp=spp)
    ids_np, x_np, y_np, inv_np, geom = _tile_order(w, h, spp, tile)
    ids, x, y = _tile_coords(cfg, geom, len(ids_np))
    assert (np.asarray(ids) == ids_np).all()
    assert (np.asarray(x) == x_np.astype(np.float32)).all()
    assert (np.asarray(y) == y_np.astype(np.float32)).all()
    if inv_np is not None:
        assert (np.asarray(_slot_of_id(cfg, geom)) == inv_np).all()


@pytest.mark.parametrize("sync_every", [2, 4])
def test_sync_every_bitwise_invariant(sync_every):
    """Batching bounces between early-exit checks may overshoot dead tiles
    but must never change any ray's radiance or count."""
    cfg = RenderConfig(width=64, height=32, spp=1, max_bounces=8, seed=7)
    scene = create_medium_scene(cfg.aspect)
    prep = prepare(scene.spheres)
    ray_id, rays = _primary_rays(cfg, scene)

    (ar, ag, ab), n_a = trace_pallas(prep, *rays, ray_id, cfg,
                                     tile_rays=1024, unroll=4, interpret=True)
    (br, bg, bb), n_b = trace_pallas(prep, *rays, ray_id, cfg,
                                     tile_rays=1024, unroll=4,
                                     sync_every=sync_every, interpret=True)
    assert int(n_a) == int(n_b)
    for a, b in zip((ar, ag, ab), (br, bg, bb)):
        assert (np.asarray(a) == np.asarray(b)).all()
