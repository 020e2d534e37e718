"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints at fixed intervals
(BS_brain.py:774-775, 813-816, 1036-1039). Here: `jax.profiler` trace capture
(perfetto-compatible), named scopes around hot ops, and throughput counters
for the headline metrics (steps/s, edges/s/chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gnnra-trace") -> Iterator[None]:
    """Capture a device trace viewable in XProf/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope     # annotate ops inside jit for the profiler


class Throughput:
    """Wall-clock throughput counter: items/s with explicit sync points."""

    def __init__(self, unit: str = "steps"):
        self.unit = unit
        self.reset()

    def reset(self):
        self._items = 0
        self._t0: Optional[float] = None

    def start(self, sync: Optional[jax.Array] = None):
        if sync is not None:
            jax.block_until_ready(sync)
        self._t0 = time.perf_counter()
        self._items = 0

    def add(self, n: int = 1):
        self._items += n

    def rate(self, sync: Optional[jax.Array] = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        assert self._t0 is not None, "call start() first"
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else float("inf")


def edges_per_second(num_edges: int, seconds_per_call: float) -> float:
    """Headline SpMM metric (BASELINE.md)."""
    return num_edges / seconds_per_call
