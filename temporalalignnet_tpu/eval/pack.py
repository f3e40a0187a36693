"""Packed video-feature tables for the evaluators.

Both evaluators upload unique videos ONCE, packed at true length into one
[R, C] row table gathered on device by per-item row offsets — H2D bytes scale
with real content instead of n_items x corpus-max padding (through the
~33 MB/s axon tunnel the padded f32 upload was ~98% of eval wall time).
A bf16 model gets a bf16 table: its first projection casts to bf16 either
way, so the host-side pre-cast is bit-equal (oracle-parity tested in
tests/test_eval.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_video_table(
    videos: Sequence[np.ndarray],  # each [vlen_i, C] float
    compute_dtype=None,            # model compute dtype (jnp.bfloat16 -> bf16 table)
    round_rows_to: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate true-length videos into one [R, C] table.

    Returns (table, offsets [len(videos)] int32).  ``round_rows_to`` pads the
    TOTAL row count only (single-video callers pass a larger bucket to bound
    recompiles across videos of different lengths).
    """
    offs, off = [], 0
    for v in videos:
        offs.append(off)
        off += int(v.shape[0])
    C = int(videos[0].shape[1])
    table = np.zeros((_round_up(max(off, 1), round_rows_to), C), np.float32)
    for v, o in zip(videos, offs):
        table[o : o + v.shape[0]] = v
    if compute_dtype == jnp.bfloat16:
        import ml_dtypes

        table = table.astype(ml_dtypes.bfloat16)
    return table, np.asarray(offs, np.int32)
