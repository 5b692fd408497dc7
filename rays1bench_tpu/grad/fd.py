"""Finite-difference gradient verification (BASELINE.json: "FD-verified
gradients" w.r.t. sphere centers, radii, albedos)."""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import numpy as np


def fd_check(f: Callable, params: Dict, coords: Sequence[Tuple[str, int]],
             eps: float = 1e-3):
    """Compare jax.grad(f)(params) against central differences.

    Args:
      f: scalar function of a dict of arrays.
      params: the point to check at.
      coords: list of (param_name, flat_index) coordinates to probe.
      eps: central-difference step.

    Returns list of (name, idx, analytic, numeric, abs_err, rel_err).
    """
    g = jax.grad(f)(params)

    def eval_at(name, idx, delta):
        pert = np.asarray(params[name]).copy()
        pert.flat[idx] += delta
        p = dict(params)
        p[name] = jax.numpy.asarray(pert)
        return float(f(p))

    rows = []
    for name, idx in coords:
        fp = eval_at(name, idx, +eps)
        fm = eval_at(name, idx, -eps)
        numeric = (fp - fm) / (2 * eps)
        analytic = float(np.asarray(g[name]).flat[idx])
        abs_err = abs(analytic - numeric)
        denom = max(abs(analytic), abs(numeric), 1e-12)
        rows.append((name, idx, analytic, numeric, abs_err, abs_err / denom))
    return rows
