"""Persistent XLA compilation cache.

First compiles over a tunneled TPU run 10-300s; caching them on disk makes
every subsequent process (tests, bench, serving restarts) start warm.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.environ.get("NVCT_JAX_CACHE", "/tmp/nvct_jax_cache")
_enabled = False


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception as e:  # pragma: no cover - best effort
        logger.warning("could not enable jax compilation cache: %s", e)
