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

    # default the persistent compile cache into the repo's own .cache/ —
    # the bench/driver environment preserves the repo tree across runs but
    # not necessarily $HOME, and a cold remote-compile service costs
    # minutes per shape (VERDICT r3 item 2)
    repo_cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
        "ctok_jax",
    )
    cache_dir = path or os.environ.get("CTOK_JAX_CACHE", repo_cache)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
