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


class StepBreakdown:
    """Device duty-cycle telemetry for an async-dispatch train loop.

    The reference's GPUStatsMonitor polls nvidia-smi for utilization/duty
    cycle (utils/tensorboard_utils.py:9-73).  There is no nvidia-smi for a
    TPU behind a tunnel, but the train loop fences every step on a scalar
    device->host fetch of the loss, so each iteration's wall time decomposes
    exactly into:

    - ``data``: waiting on the host input pipeline (device idle),
    - ``dispatch``: python/jit dispatch of the step (device mostly idle),
    - ``fence``: blocked on the device finishing the step (device busy),
    - ``other``: logging / checkpoint / python glue (device idle).

    ``fence / wall`` is a direct duty-cycle lower bound; ``data / wall`` is
    the starvation signal the reference's utilization graph is used for.
    """

    def __init__(self):
        self._acc = {"data": 0.0, "dispatch": 0.0, "fence": 0.0}
        self._t0 = time.perf_counter()

    def add(self, kind: str, seconds: float) -> None:
        self._acc[kind] += seconds

    @contextlib.contextmanager
    def measure(self, kind: str) -> Iterator[None]:
        t = time.perf_counter()
        try:
            yield
        finally:
            self.add(kind, time.perf_counter() - t)

    def snapshot(self) -> dict:
        """Percentages since the last snapshot; resets the window."""
        now = time.perf_counter()
        wall = max(now - self._t0, 1e-9)
        out = {f"{k}_pct": 100.0 * v / wall for k, v in self._acc.items()}
        out["other_pct"] = max(0.0, 100.0 - sum(out.values()))
        out["duty_pct"] = out["fence_pct"]
        for k in self._acc:
            self._acc[k] = 0.0
        self._t0 = now
        return out


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
