"""Profiling hooks: jax.profiler traces + per-step timing.

The reference shapes a torch.profiler hook but ships it disabled
(args.prof = None, train/main.py:503,133-134).  Here profiling is a real,
enableable subsystem: ``StepTimer`` feeds the steps/sec telemetry the reference
logs as 'device/sps' (train/main.py:129), and ``trace`` wraps a window of steps
in a jax.profiler trace viewable in TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


class StepTimer:
    """Wall-clock steps/sec with warmup exclusion (first step = compile)."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0: Optional[float] = None
        self.last_sps = 0.0

    def tick(self) -> float:
        self._count += 1
        now = time.perf_counter()
        if self._count <= self.warmup_steps or self._t0 is None:
            self._t0 = now
            self._n0 = self._count
            return 0.0
        dt = now - self._t0
        if dt > 0:
            self.last_sps = (self._count - self._n0) / dt
        return self.last_sps


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
