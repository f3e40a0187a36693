"""Non-blocking metrics logging.

Replaces the reference's tensorboardX PlotterThread (utils/tensorboard_utils.py:76-110):
a daemon thread drains a bounded queue of scalar writes so logging never blocks
the train step.  Sinks: always a JSONL file (greppable, no deps); TensorBoard via
tensorboardX when importable (it is an optional extra here, not a hard dep).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Dict, Optional


class MetricsWriter:
    """Queue-backed scalar writer; one JSONL line per add_scalars call."""

    def __init__(self, logdir: str, name: str = "train", use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}.metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter  # optional

                self._tb = SummaryWriter(logdir=os.path.join(logdir, name), flush_secs=60)
            except Exception:
                self._tb = None
        self._q: queue.Queue = queue.Queue(maxsize=128)
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._running = True
        self._thread.start()

    def add_scalars(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        payload = {
            "step": int(step),
            "time": time.time(),
            **{f"{prefix}{k}": float(v) for k, v in scalars.items()},
        }
        try:
            self._q.put_nowait(payload)
        except queue.Full:
            pass  # drop rather than block the step (PlotterThread contract)

    def _drain(self):
        while self._running or not self._q.empty():
            try:
                payload = self._q.get(timeout=0.25)
            except queue.Empty:
                continue
            self._file.write(json.dumps(payload) + "\n")
            if self._tb is not None:
                step = payload["step"]
                for k, v in payload.items():
                    if k not in ("step", "time"):
                        self._tb.add_scalar(k, v, step)

    def close(self):
        self._running = False
        self._thread.join(timeout=5)
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class Logger:
    """Tee console lines into a log file (reference utils/utils.py:124-136)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._file = open(path, "a", buffering=1)

    def log(self, msg: str) -> None:
        print(msg, flush=True)
        self._file.write(msg + "\n")

    def close(self) -> None:
        self._file.close()


def denormalize(frames, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Undo ImageNet normalization on [..., H, W, 3] float frames for
    visualization (reference utils/utils.py:73-86, channel-last here)."""
    import numpy as np

    frames = np.asarray(frames, np.float32)
    return np.clip(frames * np.asarray(std) + np.asarray(mean), 0.0, 1.0)


def device_memory_stats() -> Dict[str, float]:
    """TPU equivalent of the reference's nvidia-smi polling
    (utils/tensorboard_utils.py:9-73)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key] = float(stats[key])
    return out
