"""Persistent XLA compilation cache.

Remote TPU compiles in this environment take minutes per jitted function;
the cache cuts repeat runs (bench, driver re-runs, resumed training) to
seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(directory: str | None = None) -> str:
    directory = directory or os.environ.get("IPS_TPU_JAX_CACHE", DEFAULT_DIR)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return directory
