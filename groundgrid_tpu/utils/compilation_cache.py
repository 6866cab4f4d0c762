"""Persistent XLA compilation cache management.

Two reasons to pin compiled executables to disk:
  1. First compile of the 364^2 pipeline takes 1-2 minutes; cached reloads
     take ~1 s.
  2. The axon TPU compile service is shared and *time-varying*: under load it
     can return de-optimized executables that serialize the vectorized point
     ops (~500x slower steps). Once a verified-fast binary exists in the
     cache (see pipeline.compile_step_verified), every later process reuses
     it instead of re-rolling the compile lottery.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("groundgrid_tpu")

_enabled = False


def default_cache_dir() -> str:
    return os.environ.get(
        "GROUNDGRID_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "groundgrid_tpu", "xla"),
    )


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache. Returns the dir."""
    global _enabled
    import jax

    if _enabled:
        return default_cache_dir() if cache_dir is None else cache_dir
    path = cache_dir or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return path
    except Exception as e:  # cache is an optimization, never fatal
        log.warning("compilation cache disabled: %s", e)
        return None
