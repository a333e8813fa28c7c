"""Profiling and tracing hooks.

No reference counterpart (the reference has only tqdm progress bars,
SURVEY.md §5). TPU-native observability: JAX profiler traces (XPlane /
Perfetto-compatible, viewable in TensorBoard or xprof) plus a lightweight
step timer for steady-state throughput numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace of the enclosed block:
    with profiling.trace('/tmp/trace'): run_steps(...)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with compile-step exclusion."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.times) / max(len(self.times), 1)

    def throughput(self, items_per_step: int) -> float:
        if not self.times:
            return 0.0
        return items_per_step * len(self.times) / sum(self.times)
