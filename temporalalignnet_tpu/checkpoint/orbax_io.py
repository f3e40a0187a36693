"""Orbax checkpoint IO: runtime + epoch checkpoints with best-k rotation.

Replaces the reference's torch.save flows (utils/utils.py:23-57):
- ``save_runtime_checkpoint``: timestamped file, only the latest kept
  (utils.py:23-36)  -> a CheckpointManager with max_to_keep=1 under ``runtime/``.
- ``save_checkpoint``: per-epoch file, previous deleted, 5 best rotated
  (utils.py:39-57)  -> a CheckpointManager with max_to_keep=5 + best_fn under
  ``epoch/``.

The stored item is the full TrainState pytree ``{step, params, ema_params,
opt_state, rng}`` — resume restores optimizer moments and the EMA twin exactly
(the reference restores {epoch, state_dict, best_acc, optimizer, iteration},
train/main.py:438-456).  Multi-host: orbax CheckpointManager is already
multi-process safe (every process must call save; writes are coordinated), which
replaces the reference's master-only gating (end2end/main_nce.py:119,388).

Saves are ASYNC (orbax's default): ``save()`` blocks only for the d2h staging
(required — the caller's next donated step reuses the device buffers) and the
disk serialization/write happens on orbax's background thread.  Callers pass
the ON-DEVICE state; a pre-save ``jax.device_get`` adds a redundant host copy
(measured v5e-over-tunnel, 820 MB E6D6 stage-2 state: 37.8 s staged-async vs
43.7 s with device_get).  A saver THREAD over an on-device snapshot was
measured a wash on the tunnel (save + 400 steps: 36.3 s threaded vs 36.5 s
synchronous — the link serializes d2h with dispatch), so it is not used; on
PCIe-class hosts d2h is ~ms and the async write already removes the stall.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Runtime + epoch checkpoint managers over one experiment directory."""

    def __init__(
        self,
        directory: str,
        max_best: int = 5,
        best_metric: str = "Recall",
        keep_all_epochs: bool = False,
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._runtime = ocp.CheckpointManager(
            os.path.join(directory, "runtime"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        self._epoch = ocp.CheckpointManager(
            os.path.join(directory, "epoch"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None if keep_all_epochs else max_best,
                best_fn=(None if keep_all_epochs else (lambda m: m.get(best_metric, 0.0))),
                best_mode="max",
            ),
        )

    # ------------------------------------------------------------------ save

    def save_runtime(self, state: Any, step: int) -> None:
        """Every --runtime_save_iter iterations (train/main.py:143-158)."""
        self._runtime.save(step, args=ocp.args.StandardSave(state))

    def save_epoch(self, state: Any, epoch: int, metrics: Optional[dict] = None) -> None:
        self._epoch.save(
            epoch, args=ocp.args.StandardSave(state), metrics=dict(metrics or {})
        )

    def wait(self) -> None:
        self._runtime.wait_until_finished()
        self._epoch.wait_until_finished()

    # --------------------------------------------------------------- restore

    def latest_step(self) -> Optional[int]:
        rt, ep = self._runtime.latest_step(), self._epoch.latest_step()
        candidates = [s for s in (rt, ep) if s is not None]
        return max(candidates) if candidates else None

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``abstract_state``.

        Picks the newest of runtime/epoch checkpoints when ``step`` is None —
        matching the reference's '--resume with the last runtime checkpoint'
        flow.  ``abstract_state`` may be a concrete TrainState (its values are
        ignored) or a jax.eval_shape result with shardings.
        """
        rt, ep = self._runtime.latest_step(), self._epoch.latest_step()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        mgr = self._runtime if (rt is not None and (ep is None or rt >= ep)) else self._epoch
        if step not in mgr.all_steps():
            mgr = self._epoch if mgr is self._runtime else self._runtime
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def best_epoch(self) -> Optional[int]:
        return self._epoch.best_step()

    def close(self) -> None:
        self._runtime.close()
        self._epoch.close()


def save_params(path: str, params: Any, overwrite: bool = False) -> None:
    """One-shot param-only export (e.g. for the torch converter round-trip).

    Blocks until the write is durable — orbax saves are async and returning
    early leaves a half-created step directory that hangs the next reader.
    """
    ckptr = ocp.StandardCheckpointer()
    try:
        ckptr.save(os.path.abspath(path), params, force=overwrite)
        ckptr.wait_until_finished()
    finally:
        ckptr.close()


def load_params(path: str, abstract_params: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    try:
        if abstract_params is None:
            # restore-without-target replays the SAVED shardings, which fails
            # when the writer ran on a different topology (e.g. a multi-process
            # mesh read back single-process); rebuild shape/dtype targets from
            # metadata so the restore is topology-independent
            try:
                meta = ckptr.metadata(os.path.abspath(path))
                tree = meta.item_metadata.tree  # StepMetadata wrapper
                sh = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
                abstract_params = jax.tree_util.tree_map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh),
                    tree,
                )
            except Exception:
                return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), abstract_params)
    finally:
        ckptr.close()
