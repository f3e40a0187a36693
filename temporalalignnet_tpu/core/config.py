"""Frozen dataclass configs.

The reference threads a mutable argparse ``args`` namespace through every function
(reference: train/config.py:6-53, train/main.py:281-294).  Here config is immutable,
typed, and hashable so it can be closed over by jitted functions as a static value.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Mixed-precision policy.

    The reference uses fp16 autocast + GradScaler (train/main.py:81,112-118).  On TPU
    we use bf16 compute with fp32 params and fp32 loss math — no loss scaler needed.
    """

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # logits / loss always fp32: the 2-way softmax /0.07 chain (train/loss.py:104)
    # needs fp32 mantissa.
    loss_dtype: str = "float32"

    @property
    def param(self):
        return jnp.dtype(self.param_dtype)

    @property
    def compute(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def loss(self):
        return jnp.dtype(self.loss_dtype)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """TemporalAligner architecture (reference: model/tan_model.py:13-73).

    Width is 512 with 8 heads (tan_model.py:43-46); the E6D6 released model uses
    num_encoder_layers=6, num_joint_layers=6.
    """

    width: int = 512
    heads: int = 8
    num_encoder_layers: int = 6
    num_joint_layers: int = 6  # reference calls this "decoder" but it is an encoder
    video_embed_dim: int = 1024  # S3D features; 768 for CLIP-L14, 1024 for InternVideo
    language_model: str = "word2vec"  # 'word2vec' (512-d) or 'bert' (768-d)
    sim: str = "cos"  # 'cos' or 'dot' (tan_model.py:116-119)
    pos_enc: str = "learned"  # 'learned' or 'sine' (tan_model.py:57-62)
    num_pos_embeds: int = 1024  # positional table slots (tan_model.py:58)
    use_text_pos_enc: bool = False
    random_pos_start: bool = True  # random window offset augmentation (tan_model.py:162-166)
    use_alignability_head: bool = False
    return_dual_feature: bool = True
    mlp_ratio: int = 4
    # training forward returns per-layer normalized FEATURES instead of the
    # materialized [B,S,T,B,N] cross-batch logits, for the fused MIL-NCE
    # Pallas kernel (ops/pallas_milnce.py); pair with LossConfig.use_fused_milnce
    fused_milnce: bool = False

    @property
    def text_embed_dim(self) -> int:
        return {"bert": 768, "word2vec": 512}[self.language_model]

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss / self-labelling options (reference: train/loss.py:55-373, train/config.py)."""

    model: str = "init"  # 'init' (Stage 1) or 'cotrain' (Stage 2)
    sim: str = "cos"
    temperature: float = 0.07
    learn_agreement: bool = False
    temporal_agreement_type: str = "keep"  # 'i' | 'u' | 'keep' | 'keep-joint'
    loss_threshold: float = 0.0  # 0.5 for Stage 2 (train/readme.md:13)
    use_alignability_head: bool = False
    optim_policy: str = "default"  # 'default' | 'bce' (head-only finetune)
    iou_threshold: float = 0.5  # loss.py:197
    confidence_quantile: float = 0.3  # loss.py:191-194
    # alignability head trains on the joint encoder's layer index 2 (loss.py:341)
    alignability_layer: int = 2
    mask_value: float = -6.0e4  # fp16/bf16-safe -inf substitute (loss.py:98-100)
    # compute the MIL-NCE logsumexps with the fused Pallas kernel from feature
    # outputs (requires ModelConfig.fused_milnce); the [B,S,T,B,N] logits
    # tensors then never exist in HBM.  Under a mesh the kernel runs per-device
    # via shard_map with a cross-device column-lse merge (ops/pallas_milnce.py).
    use_fused_milnce: bool = False

    def replace(self, **kw) -> "LossConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Fixed-shape data pipeline options.

    The reference pads text ragged per batch (data/loader_htm.py:111-129); under jit we
    need static shapes, so sentences pad to ``max_sentences`` and tokens to
    ``max_words`` (reference default 32, model/word2vec_model.py:28).
    """

    seq_len: int = 64  # training window (train/config.py:12)
    max_sentences: int = 16  # N_max per window
    max_words: int = 32
    batch_size: int = 16
    num_prefetch: int = 2
    feature_dim: int = 1024


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization (reference: train/config.py:6-53, train/main.py:330-356,486-499)."""

    lr: float = 1.0e-4
    wd: float = 1.0e-5
    epochs: int = 20
    warmup_iterations: int = 1000
    total_iterations: int = 100_000
    backprop_freq: int = 1  # gradient accumulation
    clip_grad_norm: float = 0.0  # 0 = off
    clip_mode: str = "per_param"  # 'per_param' (DINO-style, reference
    # utils/train_utils.py:3-13) or 'global'
    skip_nonfinite_updates: bool = False  # improvement over the reference,
    # which backprops NaN losses (train/main.py:108-109, SURVEY §5)
    ema_momentum: float = 0.999  # tan_model.py:317
    use_cosine_schedule: bool = True
    seed: int = 0
    runtime_save_iter: int = 1000
    # mesh: data-parallel x tensor-parallel axis sizes; -1 = all remaining devices
    dp_size: int = -1
    tp_size: int = 1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Zero-shot eval options (reference: eval/eval_zeroshot_align.py:97-252)."""

    seq_len: int = 64
    window_stride: int = 16  # seq_len // 4 (eval_zeroshot_align.py:129)
    method: str = "overlap-seq"  # 'overlap-seq' or 'global'
    use_alignability_head: bool = False
    alignability_layer: int = 2  # "3rd layer works the best" (eval_zeroshot_align.py:186)
    batch_windows: int = 32  # windows evaluated per jit call (TPU batching)
    num_clips: int = 10  # YC2 multi-window sampling (eval_zeroshot_retrieval.py)
    # corpus eval: videos per packed-table sub-batch — each sub-batch's table
    # device_puts and its canvas dispatches BEFORE any result is fetched, so
    # H2D uploads can stream while earlier sub-batches compute.  Default 0 =
    # one monolithic deduped table: MEASURED FASTER on the axon tunnel
    # (80-video corpus, same session: 17.6-20.3 s monolithic vs 26.6-36.1 s
    # at 8 — the tunnel serializes transfers with dispatch, so sub-batching
    # only adds per-transfer latency and pad rows).  Set >0 only on hosts
    # with genuinely async H2D.
    pipeline_videos: int = 0
    # method='global' corpus eval: videos are sorted by length and split into
    # at most this many padded-length buckets, each running ONE vmapped jit
    # (text padded to the corpus max bucket) — bounding compiles at
    # global_buckets instead of one per distinct round_up(vlen, 64) (dozens
    # of 1-4 min tunnel compiles on a real 100-2000 s corpus).
    global_buckets: int = 3
