"""Checkpoint / resume for the inverse-rendering optimization loop.

The reference needs no checkpointing (runs are seconds; SURVEY.md §5 — its
only persistence is the out_<scene>.txt result records). The optimization
loop is the one long-running process in this framework, so its state — scene
parameter dict, Adam state, step counter — checkpoints to a single .npz
(flat, dependency-free; orbax would be overkill for a few KB of spheres).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}::treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}::{i}"] = np.asarray(leaf)


def save(path: str, params: Dict, opt_state: Any, step: int) -> None:
    """Atomically write (params, opt_state, step) to `path` (.npz)."""
    out: Dict[str, np.ndarray] = {"step": np.asarray(step)}
    for name, value in params.items():
        out[f"param::{name}"] = np.asarray(value)
    _flatten(opt_state, "opt", out)
    tmp = path + ".tmp"
    np.savez(tmp, **out)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def restore(path: str, opt_state_like: Any) -> Tuple[Dict, Any, int]:
    """Load (params, opt_state, step); `opt_state_like` provides the pytree
    structure to rebuild the optimizer state into.

    The stored treedef string must match `opt_state_like`'s: restoring into
    a different optimizer would otherwise silently mis-zip leaves into the
    wrong slots (e.g. Adam mu where nu belongs)."""
    data = np.load(path)
    params = {k[len("param::"):]: jax.numpy.asarray(data[k])
              for k in data.files if k.startswith("param::")}
    leaves = [jax.numpy.asarray(data[f"opt::{i}"])
              for i in range(len([k for k in data.files
                                  if k.startswith("opt::")
                                  and not k.endswith("treedef")]))]
    treedef = jax.tree_util.tree_structure(opt_state_like)
    stored = bytes(data["opt::treedef"]).decode()
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint {path} was saved for a different optimizer state "
            f"structure:\n  stored:   {stored}\n  restoring: {treedef}")
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, int(data["step"])
