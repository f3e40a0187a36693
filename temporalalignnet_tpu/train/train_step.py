"""Jitted train step: forward + loss + grad + optimizer + EMA in ONE pjit program.

Replaces the reference inner loop (train/main.py:33-162):
- amp.autocast/GradScaler        -> bf16 compute policy, fp32 loss, no scaler
- loss.backward()/optimizer.step -> jax.value_and_grad + optax in the same program
- TwinTemporalAligner EMA module -> a second param pytree updated by tree_map
  (tan_model.py:340-344), with the target branch running deterministic
  (random_pos_start off, tan_model.py:333)
- NCCL DDP                       -> GSPMD: batch sharded over the 'data' mesh axis,
  params replicated (or TP-sharded); XLA inserts the cross-device all-gather the
  global in-batch negatives need (SURVEY §2.8)

Batch dict (all fixed shapes):
  video [B,T,Cv] f32, video_padding_mask [B,T] bool, input_ids [B,N,W] i32,
  text_padding_mask [B,N] bool, start [B,N] f32, end [B,N] f32,
  abs_text_pos [B,N,2] f32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
from temporalalignnet_tpu.losses.tan_loss import get_loss
from temporalalignnet_tpu.models.net import TANWithText
from temporalalignnet_tpu.parallel.mesh import DATA_AXIS
from temporalalignnet_tpu.train.optimizer import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any  # None for Stage-1 'init'
    opt_state: Any
    rng: jnp.ndarray


def create_train_state(
    model: TANWithText,
    cfg: TrainConfig,
    loss_cfg: LossConfig,
    sample_batch: Dict[str, jnp.ndarray],
    seed: int = 0,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Init params (+EMA copy for cotrain, tan_model.py:335-338) and optimizer.

    With a mesh, params are placed per the TP rules (replicated by default) and the
    optimizer state is built under jit so its moments inherit the param shardings —
    from then on plain jax.jit propagates shardings from its committed inputs.
    """
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        {"params": rng, "pos": jax.random.fold_in(rng, 1)},
        sample_batch["video"],
        sample_batch["input_ids"],
        deterministic=False,
    )["params"]
    tx = make_optimizer(cfg, params, policy=loss_cfg.optim_policy)
    step = jnp.zeros((), jnp.int32)
    state_rng = jax.random.fold_in(rng, 2)
    if mesh is not None:
        from temporalalignnet_tpu.parallel.mesh import place_opt_state, place_params

        params = place_params(params, mesh)
        # every state leaf must be committed onto the mesh: a checkpoint restore
        # reproduces each leaf's sharding exactly, and any device-0-only leaf
        # next to mesh-placed params is an incompatible-devices error under jit
        opt_state = place_opt_state(tx.init(params), mesh)
        rep = NamedSharding(mesh, P())
        step = jax.device_put(step, rep)
        state_rng = jax.device_put(state_rng, rep)
    else:
        opt_state = tx.init(params)
    # EMA target starts as a true copy (tan_model.py:335-338); must not alias the
    # online buffers or donation in the jitted step double-donates them.
    ema = (
        jax.tree_util.tree_map(lambda x: x.copy(), params)
        if loss_cfg.model == "cotrain"
        else None
    )
    return (
        TrainState(
            step=step,
            params=params,
            ema_params=ema,
            opt_state=opt_state,
            rng=state_rng,
        ),
        tx,
    )


def _build_step_fn(
    model: TANWithText,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    loss_cfg: LossConfig,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    cotrain = loss_cfg.model == "cotrain"

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            outputs = model.apply(
                {"params": params},
                batch["video"],
                batch["input_ids"],
                video_padding_mask=batch["video_padding_mask"],
                lang_padding_mask=batch["text_padding_mask"],
                deterministic=False,
                rngs={"pos": step_rng},
            )
            if cotrain:
                # EMA branch: no grad, no random pos start (tan_model.py:333,349-351)
                ema_out = model.apply(
                    {"params": state.ema_params},
                    batch["video"],
                    batch["input_ids"],
                    video_padding_mask=batch["video_padding_mask"],
                    lang_padding_mask=batch["text_padding_mask"],
                    deterministic=True,
                )
                outputs = dict(
                    outputs,
                    **{
                        f"ema-{k}": jax.lax.stop_gradient(v)
                        for k, v in ema_out.items()
                    },
                )
            return get_loss(outputs, batch, loss_cfg, mesh=mesh)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if cotrain:
            # momentum update only on real optimizer steps (main.py:112-122);
            # with gradient accumulation the effective momentum becomes 1 on
            # accumulation-only steps.
            is_update = (state.step + 1) % cfg.backprop_freq == 0
            m = jnp.where(is_update, cfg.ema_momentum, 1.0)
            ema_params = jax.tree_util.tree_map(
                lambda t, o: t * m + o * (1.0 - m), state.ema_params, params
            )

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            rng=state.rng,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def make_train_step(
    model: TANWithText,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    loss_cfg: LossConfig,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    # Sharding is carried by the inputs: create_train_state(mesh=...) places the
    # state per the TP rules, the data pipeline device_puts batches with
    # PartitionSpec('data'), and jit/GSPMD propagates — collectives (grad
    # all-reduce over 'data', activation collectives over 'model') are inserted
    # automatically and ride ICI.
    return jax.jit(_build_step_fn(model, tx, cfg, loss_cfg, mesh), donate_argnums=(0,))


def make_multi_train_step(
    model: TANWithText,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    loss_cfg: LossConfig,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """K optimizer steps per dispatch: lax.scan of the train step over batches
    whose leaves are stacked [K, B, ...] (see stack_batches).

    Why: each jit dispatch over the axon tunnel costs ~3 ms of serial latency
    that host-side call pipelining does not hide (profiles/eval_fwd_b192_v5e.md),
    and the per-step loss fetch used for metering is a full round trip.  Scanning
    K steps amortizes both to one dispatch + one [K]-scalar fetch.  Semantics are
    identical to K sequential steps (same rng fold-in by state.step, same EMA /
    backprop_freq gating) — tested in tests/test_train.py.

    Returns (state, metrics) where each metrics leaf is stacked [K].
    """
    step_fn = _build_step_fn(model, tx, cfg, loss_cfg, mesh)

    def multi_fn(state: TrainState, batches: Dict[str, jnp.ndarray]):
        return jax.lax.scan(step_fn, state, batches)

    return jax.jit(multi_fn, donate_argnums=(0,))


def stack_batches(batches, mesh: Optional[Mesh] = None) -> Dict[str, jnp.ndarray]:
    """Stack a list of same-shape host batches into [K, B, ...] leaves for
    make_multi_train_step; with a mesh the batch axis (axis 1) shards over
    'data' and the scan axis stays replicated."""
    import numpy as np

    stacked = {
        k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]
    }
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in stacked.items()}
    from temporalalignnet_tpu.parallel.mesh import put_global

    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return {k: put_global(v, sh) for k, v in stacked.items()}


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a host batch with the leading axis sharded over 'data'.

    Multi-process aware: each process passes its local rows and put_global
    assembles the global array (jax.make_array_from_process_local_data)."""
    from temporalalignnet_tpu.parallel.mesh import put_global

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return {k: put_global(v, sh) for k, v in batch.items()}
