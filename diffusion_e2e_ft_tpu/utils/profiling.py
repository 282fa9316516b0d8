"""Profiling: jax.profiler traces and a step-time / throughput meter.

The reference has no profiling beyond tqdm; this supplies the TPU-native
observability SURVEY.md flags as a gap (jax.profiler traces + img/sec meters)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time and items/sec meter (skips warmup/compile steps)."""

    def __init__(self, skip_first: int = 2, window: int = 50):
        self.skip_first = skip_first
        self.window = window
        self._times = []
        self._count = 0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip_first:
                self._times.append(now - self._last)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def items_per_sec(self, items_per_step: int = 1) -> float:
        t = self.mean_step_time
        return items_per_step / t if t and t == t else float("nan")
