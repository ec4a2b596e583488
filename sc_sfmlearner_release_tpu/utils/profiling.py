"""Profiling and debugging hooks (first-class, unlike the reference's manual
cuda.synchronize timing — SURVEY.md §5.1-5.2).

* ``trace(dir)``: context manager capturing a jax.profiler trace viewable in
  TensorBoard / Perfetto.
* ``StepTimer``: wall-clock per-step statistics with compile-step exclusion.
* ``enable_nan_debugging()``: jax debug_nans — the functional counterpart of
  the reference's ``torch.autograd.set_detect_anomaly(True)`` but opt-in,
  not always-on (the reference leaves it enabled globally, train.py:67,
  a significant slowdown this framework does not reproduce).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Per-step wall-clock stats; the first ``skip`` steps (compiles) are
    excluded from aggregates."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times = []
        self._t0 = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else 0.0

    @property
    def p99(self) -> float:
        return float(np.percentile(self.times, 99)) if self.times else 0.0

    def summary(self) -> str:
        return (
            f"steps={len(self.times)} mean={self.mean * 1e3:.1f}ms "
            f"p50={self.p50 * 1e3:.1f}ms p99={self.p99 * 1e3:.1f}ms"
        )
