"""Profiling hooks (reference has none — SURVEY.md section 5.1).

`jax.profiler` traces around the jitted train step + a simple step timer.
Usage:
    with trace_if("/tmp/leco-trace", enabled=args.profile):
        train(...)
or per-step timings via `StepTimer` passed as the trainer's on_step hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """on_step hook: records wall-clock per iteration and reports it/s.
    The first `warmup` steps (compilation) are excluded from the average."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._last: Optional[float] = None

    def __call__(self, i: int, loss: float) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steady_state_times(self) -> list[float]:
        return self.times[self.warmup :]

    @property
    def its_per_sec(self) -> float:
        ts = self.steady_state_times
        return len(ts) / sum(ts) if ts else 0.0

    def summary(self) -> dict:
        ts = self.steady_state_times
        if not ts:
            return {"its_per_sec": 0.0}
        return {
            "its_per_sec": self.its_per_sec,
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
            "n": len(ts),
        }
