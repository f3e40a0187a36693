"""End-to-end S3D fine-tuning on HTM-AA — the reference end2end/main_nce.py path.

TPU-first re-design:
- DDP + NCCL (main_nce.py:140-158, 283-285) -> a ('data',) mesh; the symmetric
  InfoNCE couples the whole batch, and sharding the batch under jit makes XLA
  all-gather the (cheap, 512-d) embeddings over ICI automatically;
- amp.autocast + GradScaler (main_nce.py:78, 91-97) -> bf16 compute, fp32 loss;
- FrozenBN module surgery (end2end/freeze_bn.py:6-37) -> BatchNorm with
  use_running_average=True is the model default (models/s3d.py);
- the S3D text module (Sentence_Embedding, s3dg.py:186-247) is the same
  Word2VecEncoder used by TAN.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from temporalalignnet_tpu.core.config import TrainConfig
from temporalalignnet_tpu.models.s3d import S3D
from temporalalignnet_tpu.models.word2vec import Word2VecEncoder


def nce_loss(
    video_emb: jnp.ndarray,  # [B, C]
    text_emb: jnp.ndarray,  # [B, C]
    temperature: float = 0.07,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Symmetric InfoNCE over in-batch negatives + top-1 accs
    (reference end2end/main_nce.py:30-47)."""
    logits = (
        jnp.einsum("bc,kc->bk", video_emb, text_emb,
                   preferred_element_type=jnp.float32) / temperature
    )
    B = logits.shape[0]
    labels = jnp.arange(B)
    loss_v2t = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t2v = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = (loss_v2t.mean() + loss_t2v.mean()) / 2.0
    metrics = {
        "loss": loss,
        "top1/v2t": (logits.argmax(-1) == labels).mean(),
        "top1/t2v": (logits.argmax(0) == labels).mean(),
    }
    return loss, metrics


@flax.struct.dataclass
class E2ETrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class S3DWithText:
    """Bundles the S3D video tower and word2vec text tower for InfoNCE."""

    def __init__(
        self,
        num_classes: int = 512,
        vocab_size: int = 66251,
        freeze_early: bool = False,
        train_bn_stats: bool = False,
        dtype=jnp.float32,
        fold_s2d: bool = True,
    ):
        self.video = S3D(
            num_classes=num_classes,
            use_running_average=not train_bn_stats,
            freeze_early=freeze_early,
            dtype=dtype,
            fold_s2d=fold_s2d,
        )
        self.text = Word2VecEncoder(
            vocab_size=vocab_size, output_dim=num_classes, dtype=dtype
        )

    def init(self, rng, clips, input_ids):
        v = self.video.init(rng, clips)
        t = self.text.init(jax.random.fold_in(rng, 1), input_ids)
        return {
            "params": {"video": v["params"], "text": t["params"]},
            "batch_stats": v.get("batch_stats", {}),
        }

    def video_embed(self, variables, clips, update_stats: bool = False):
        """Forward the video tower.  With ``update_stats=True`` (only legal
        when the model was built with ``train_bn_stats=True``) returns
        ``(embeddings, new_batch_stats)`` — the unfrozen-BN path of the
        reference (s3dg.py:93-150 BN in train mode; end2end/model_e2e.py:11-18
        is where the reference chooses frozen vs live BN)."""
        variables = {"params": variables["params"]["video"],
                     "batch_stats": variables["batch_stats"]}
        if update_stats:
            out, mutated = self.video.apply(
                variables, clips, mutable=["batch_stats"]
            )
            return out, mutated["batch_stats"]
        return self.video.apply(variables, clips)

    def text_embed(self, variables, input_ids, attention_mask=None):
        return self.text.apply(
            {"params": variables["params"]["text"]}, input_ids, attention_mask
        )["pooler_output"]


def make_e2e_train_step(
    model: S3DWithText,
    tx: optax.GradientTransformation,
    temperature: float = 0.07,
) -> Callable[[E2ETrainState, Dict[str, jnp.ndarray]], Tuple[E2ETrainState, Dict]]:
    """One fused step: S3D fwd + text fwd + InfoNCE + grad + update.

    Batch: {'clips': [B, n, T, H, W, 3], 'input_ids': [B, n, W_words]} —
    clips flattened to (B n) as in the reference (main_nce.py:75-77).

    If the model was built with ``train_bn_stats=True`` (BN in train mode,
    i.e. the reference WITHOUT its freeze_bn surgery), the step also runs
    BN-statistics accumulation and threads the updated running stats into
    the returned state.
    """
    train_stats = not model.video.use_running_average

    def step_fn(state: E2ETrainState, batch):
        clips = batch["clips"]
        ids = batch["input_ids"]
        B, n = clips.shape[:2]
        clips = clips.reshape((B * n,) + clips.shape[2:])
        ids = ids.reshape(B * n, ids.shape[-1])

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if train_stats:
                v, new_stats = model.video_embed(variables, clips, update_stats=True)
            else:
                v = model.video_embed(variables, clips)
                new_stats = state.batch_stats
            t = model.text_embed(variables, ids, (ids != 0).astype(jnp.int32))
            loss, metrics = nce_loss(
                v.astype(jnp.float32), t.astype(jnp.float32), temperature
            )
            return loss, (metrics, new_stats)

        (_, (metrics, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = E2ETrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_e2e_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    """AdamW; no weight decay for bn/bias params (main_nce.py:252-272)."""

    def no_decay(path) -> bool:
        names = [str(getattr(k, "key", k)) for k in path]
        return names[-1] == "bias" or any(n.startswith("bn") for n in names)

    mask = jax.tree_util.tree_map_with_path(lambda p, _: not no_decay(p), params)
    from temporalalignnet_tpu.train.optimizer import cosine_warmup_schedule

    tx = optax.adamw(
        learning_rate=cosine_warmup_schedule(cfg),
        weight_decay=cfg.wd,
        mask=mask,
    )
    if cfg.backprop_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.backprop_freq)
    return tx
