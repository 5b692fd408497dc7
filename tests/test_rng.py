"""Stateless RNG tests (core/rng.py).

The reference's RNG contract (mymath.h:17-73): uniform floats in [0,1)/[0,2)
with 24-bit resolution, plus uniform-in-ball and uniform-in-disk samplers
(mymath.h:224-235, rayweek1.cpp:353-362). Ours must match the distributions
(not the streams) and add determinism-by-coordinates.
"""

import jax.numpy as jnp
import numpy as np

from rays1bench_tpu.core import rng


def _ids(n=20000):
    return jnp.arange(n, dtype=jnp.int32)


def test_uniform01_range_and_determinism():
    u1 = np.asarray(rng.uniform01(7, _ids(), 0, 0))
    u2 = np.asarray(rng.uniform01(7, _ids(), 0, 0))
    assert (u1 >= 0).all() and (u1 < 1).all()
    np.testing.assert_array_equal(u1, u2)


def test_uniform01_decorrelated_across_axes():
    base = np.asarray(rng.uniform01(7, _ids(), 0, 0))
    for other in [rng.uniform01(8, _ids(), 0, 0),
                  rng.uniform01(7, _ids(), 1, 0),
                  rng.uniform01(7, _ids(), 0, 1)]:
        other = np.asarray(other)
        assert not np.array_equal(base, other)
        corr = np.corrcoef(base, other)[0, 1]
        assert abs(corr) < 0.03


def test_uniform01_moments():
    u = np.asarray(rng.uniform01(3, _ids(200000), 0, 0))
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 2e-3


def test_uniform02_range():
    u = np.asarray(rng.uniform02(3, _ids(), 0, 0))
    assert (u >= 0).all() and (u < 2).all()


def test_in_unit_ball_uniform():
    x, y, z = rng.in_unit_ball(11, _ids(100000), 0)
    r = np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2 + np.asarray(z) ** 2)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform in ball: E[r] = 3/4, and r^3 ~ U(0,1).
    assert abs(r.mean() - 0.75) < 3e-3
    assert abs((r ** 3).mean() - 0.5) < 4e-3
    # Isotropy: component means ~ 0.
    for c in (x, y, z):
        assert abs(np.asarray(c).mean()) < 3e-3


def test_in_unit_disk_uniform():
    x, y = rng.in_unit_disk(13, _ids(100000), 0)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # Uniform in disk: r^2 ~ U(0,1).
    assert abs(r2.mean() - 0.5) < 4e-3


def test_broadcasting_scalars():
    u = rng.uniform01(1, 5, 2, 3)
    assert u.shape == ()
