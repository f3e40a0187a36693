"""Optimizer: AdamW with param-group masking + cosine/warmup schedule.

Parity targets:
- no weight decay for LayerNorm params / biases / logit-scales
  (reference: train/main.py:330-356, patterns '.ln_', '.bias', '.logit_scale',
  '.entropy_scale')
- 'bce' policy trains only the binary head (main.py:345-352)
- linear warmup (1000 iters) then cosine decay to 0 (main.py:486-499)
- the frozen word2vec embedding (word2vec_model.py:85-86) gets zero updates
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from temporalalignnet_tpu.core.config import TrainConfig


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _no_decay(path: str) -> bool:
    """LayerNorm / bias / scale params skip weight decay (main.py:332).

    Parity note: the reference pattern '.ln_' does NOT match HF BERT's
    'LayerNorm' parameter names, so with --language_model bert the BERT
    LayerNorm weights DO get weight decay there — reproduced here (only the
    aligner's ln_* family is exempt).
    """
    parts = path.split("/")
    if parts[-1] == "bias":
        return True
    # flax LayerNorm params are <ln_name>/{scale,bias}
    if any(p.startswith("ln_") for p in parts):
        return True
    if "logit_scale" in parts or "entropy_scale" in parts:
        return True
    return False


def _trainable(path: str, policy: str) -> bool:
    if "word_embd" in path:  # frozen word2vec embedding
        return False
    if policy == "bce":
        return "binary_head" in path
    return True


def cosine_warmup_schedule(cfg: TrainConfig) -> optax.Schedule:
    """lr multiplier: it/warmup, then 0.5*(1+cos(pi * progress)) (main.py:488-494)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / cfg.warmup_iterations
        total = max(cfg.total_iterations - cfg.warmup_iterations, 1)
        progress = (step - cfg.warmup_iterations) / total
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        mult = jnp.where(step < cfg.warmup_iterations, warm, cos)
        return cfg.lr * mult

    return fn


def clip_per_param(max_norm: float) -> optax.GradientTransformation:
    """DINO-style PER-PARAMETER norm clip (reference utils/train_utils.py:3-13):
    each parameter tensor's gradient is scaled down independently when its own
    L2 norm exceeds ``max_norm`` — unlike global-norm clipping."""

    def update_fn(updates, state, params=None):
        def clip(g):
            n = jnp.linalg.norm(g.astype(jnp.float32).reshape(-1))
            coef = jnp.minimum(max_norm / (n + 1e-6), 1.0)
            return (g * coef).astype(g.dtype)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_optimizer(
    cfg: TrainConfig,
    params: Any,
    policy: str = "default",
) -> optax.GradientTransformation:
    """AdamW with decay masking, trainable masking, optional grad clip and
    gradient accumulation (optax.MultiSteps mirrors --backprop_freq,
    main.py:113)."""
    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: not _no_decay(_path_str(p)), params
    )
    trainable_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: _trainable(_path_str(p), policy), params
    )

    chain = []
    if cfg.clip_grad_norm > 0:
        if cfg.clip_mode == "per_param":
            chain.append(clip_per_param(cfg.clip_grad_norm))
        else:
            chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=cosine_warmup_schedule(cfg),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.wd,
            mask=decay_mask,
        )
    )
    tx = optax.chain(*chain)
    # zero updates for frozen params
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask),
    )
    if cfg.skip_nonfinite_updates:
        # the reference backprops NaN losses and only hides them from the
        # meters (train/main.py:108-109) — here non-finite grads skip the step
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if cfg.backprop_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.backprop_freq)
    return tx
