"""Observability: structured counters + optional jax.profiler tracing.

The reference has only \\r-rewritten progress bars and println logging
(SURVEY §5.1/§5.5).  Here: a lightweight counter registry (bytes/s,
merges/s, texts/s are the north-star metrics) and a profiler context that
wraps ``jax.profiler.trace`` when requested.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("complexity_tokenizer_tpu")

__all__ = ["Counters", "counters", "profile_trace", "Timer"]


class Counters:
    def __init__(self):
        self._counts: dict[str, float] = defaultdict(float)
        self._times: dict[str, float] = defaultdict(float)

    def add(self, name: str, value: float = 1.0) -> None:
        self._counts[name] += value

    def add_time(self, name: str, seconds: float) -> None:
        self._times[name] += seconds

    def rate(self, name: str) -> float:
        t = self._times.get(name, 0.0)
        return self._counts.get(name, 0.0) / t if t > 0 else 0.0

    def snapshot(self) -> dict:
        out = dict(self._counts)
        out.update({f"{k}_seconds": v for k, v in self._times.items()})
        for k in self._counts:
            if k in self._times and self._times[k] > 0:
                out[f"{k}_per_s"] = self._counts[k] / self._times[k]
        return out

    def reset(self) -> None:
        self._counts.clear()
        self._times.clear()


counters = Counters()


class Timer:
    """Context manager accumulating wall time into a counter bucket."""

    def __init__(self, name: str, count: float = 0.0, registry: Counters = counters):
        self.name = name
        self.count = count
        self.registry = registry

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.registry.add_time(self.name, dt)
        if self.count:
            self.registry.add(self.name, self.count)
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler.trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
