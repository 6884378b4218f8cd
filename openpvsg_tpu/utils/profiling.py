"""Tracing / profiling utilities.

The reference ships only a wall-clock fps Timer (reference:
models/unitrack/utils/meter.py:1-48). This module provides that surface plus
first-class TPU tracing: `trace()` wraps jax.profiler so any pipeline stage
can emit a TensorBoard-compatible device trace (SURVEY §5 'tracing: none' —
an explicit gap the rebuild fills).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Running-average wall-clock timer (reference Timer surface:
    tic/toc/average_time)."""

    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def clear(self):
        self.__init__()


class StageTimer:
    """Named per-stage accumulator for pipeline profiling."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v['total_s']:.2f}s ({v['calls']}x)"
            for k, v in self.summary().items())


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Device trace via jax.profiler (viewable in TensorBoard/XProf).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
