"""Profiling hooks: JAX trace context + edges/s accounting.

The reference's only instrumentation is wall-clock eval timing
(train.py:921-940); SURVEY §5.1 calls for profiler hooks and a derived
edges/s metric — provided here and wired into the epoch drivers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard / xprof).
    No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Accumulates (edges, seconds) and reports edges/s."""

    def __init__(self):
        self.edges = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, edges: int):
        if self._t0 is not None:
            self.seconds += time.perf_counter() - self._t0
            self.edges += edges
            self._t0 = None

    @property
    def edges_per_sec(self) -> float:
        return self.edges / self.seconds if self.seconds > 0 else 0.0
