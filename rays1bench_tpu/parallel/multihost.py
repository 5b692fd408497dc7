"""Multi-host initialization and fault-tolerant shard re-rendering.

The reference is a single process (SURVEY.md §5: no failure detection; "the
process either completes or crashes"). For multi-host TPU rendering:

* `init()` wraps jax.distributed.initialize — JAX's failure semantics (a dead
  host fails collective init / hangs the mesh) are the detection mechanism;
* `render_with_retry` provides the renderer-level recovery story: because the
  RNG is stateless in ray ids, ANY subset of rays can be re-rendered on any
  device at any time and merged bit-exactly — so a failed shard is simply
  rendered again, locally, without restarting the job. (The analog in the
  reference would be re-running a tile whose thread died — impossible there
  because RNG state dies with the thread.)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize JAX distributed (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def render_with_retry(render_shard: Callable[[np.ndarray], np.ndarray],
                      ray_id_shards: Sequence[np.ndarray],
                      max_retries: int = 2) -> Tuple[np.ndarray, int]:
    """Render shards with per-shard retry; returns (concatenated radiance,
    number of retried shards).

    `render_shard(ids) -> radiance` may raise on device failure; statelessness
    makes the retry produce bit-identical results.
    """
    out = []
    retried = 0
    for ids in ray_id_shards:
        for attempt in range(max_retries + 1):
            try:
                out.append(np.asarray(render_shard(ids)))
                break
            except Exception:
                if attempt == max_retries:
                    raise
                retried += 1
    return np.concatenate(out, axis=0), retried
