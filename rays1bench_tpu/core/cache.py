"""Persistent compilation cache setup.

Kernel compiles go through a remote TPU compile service in this environment
and can take minutes; the persistent cache makes them one-time. The
JAX_COMPILATION_CACHE_DIR env var alone is NOT sufficient on this JAX
version — the config entries must be set explicitly before first compile.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             "/tmp/rays1bench_jax_cache")


def enable(path: str = DEFAULT_DIR) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    return path
