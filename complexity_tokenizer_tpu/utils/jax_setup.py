"""Shared JAX runtime setup: persistent compilation cache."""

from __future__ import annotations

import os

_done = False


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent)."""
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = path or os.environ.get(
        "CTOK_JAX_CACHE", os.path.expanduser("~/.cache/ctok_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
