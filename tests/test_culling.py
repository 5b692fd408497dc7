"""Culling metadata tests (kernels/culling.py): Morton ordering and
conservative chunk bounds."""

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


def test_chunk_bounds_contain_spheres():
    cx, cy, cz, r = _random_spheres(128, seed=7)
    valid = r != 0
    perm = culling.morton_order(cx, cy, cz, valid)
    cx, cy, cz, r = cx[perm], cy[perm], cz[perm], r[perm]
    bounds = culling.chunk_bounds(cx, cy, cz, r, valid[perm], 32)
    assert bounds.shape == (4, 4)
    for c in range(4):
        bcx, bcy, bcz, brsq = bounds[:, c]
        br = np.sqrt(brsq)
        sl = slice(c * 32, (c + 1) * 32)
        d = np.sqrt((cx[sl] - bcx) ** 2 + (cy[sl] - bcy) ** 2
                    + (cz[sl] - bcz) ** 2) + np.abs(r[sl])
        assert (d <= br + 1e-4).all(), c


def test_chunk_bounds_placeholder_chunk_poisoned():
    n = 64
    cx = np.zeros(n, np.float32)
    cy = np.zeros(n, np.float32)
    cz = np.zeros(n, np.float32)
    r = np.zeros(n, np.float32)
    r[:10] = 0.5  # only first chunk has real spheres
    bounds = culling.chunk_bounds(cx, cy, cz, r, r != 0, 32)
    assert bounds[3, 0] > 0          # real chunk: positive radius^2
    assert bounds[3, 1] < -1e29      # placeholder chunk: poisoned


def test_negative_radius_included_in_bounds():
    """Hollow-glass (negative radius) spheres occupy |radius| of space."""
    cx = np.array([0.0, 5.0], np.float32)
    cy = np.zeros(2, np.float32)
    cz = np.zeros(2, np.float32)
    r = np.array([-2.0, 0.5], np.float32)
    bounds = culling.chunk_bounds(cx, cy, cz, r, r != 0, 2)
    br = np.sqrt(bounds[3, 0])
    # bound must reach x = -2 (left edge of the hollow sphere)
    assert bounds[0, 0] - br <= -2.0 + 1e-3
