"""Agreement self-labelling — the Stage-2 heart (reference: train/loss.py:88-229).

Given the (EMA) model's same-video similarity logits, find each sentence's best
temporal window by sliding an average-pool kernel of the sentence's original
duration over all positions ("circulant kernel bank", loss.py:16-23,117-144),
check dual/joint agreement by IoU, gate by confidence quantiles, and emit
pseudo-label targets.

Everything here is fixed-shape and differentiation-free (the caller wraps in
stop_gradient; the reference runs under torch.no_grad, loss.py:89).

Shapes: logits_diag [B, S, T, N] (same-video slice), masks [B,T]/[B,N] True=pad,
binary_tgt_raw [B, N, T].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from temporalalignnet_tpu.core.config import LossConfig
from temporalalignnet_tpu.losses.masked import masked_mean, masked_quantile


def circulant_last(x: jnp.ndarray) -> jnp.ndarray:
    """C[..., i, j] = x[..., (j - i) mod T] (loss.py:16-23 semantics).

    Row i is x rolled right by i: sliding the duration-kernel to start index i.
    """
    T = x.shape[-1]
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    idx = (j - i) % T  # [T, T]
    return jnp.take(x, idx, axis=-1)  # [..., T, T]


def _window_kernel_bank(
    binary_tgt_raw: jnp.ndarray,  # [B, N, T]
    text_padding_mask: jnp.ndarray,  # [B, N]
) -> jnp.ndarray:
    """Normalized sliding average-pool kernels [B, N, T(start), T(pos)]
    (loss.py:113-132)."""
    B, N, T = binary_tgt_raw.shape
    durations = jnp.maximum(binary_tgt_raw.sum(-1).astype(jnp.float32), 1.0)
    durations = jnp.where(text_padding_mask, 0.0, durations)  # loss.py:115

    steps = jnp.arange(T, dtype=jnp.float32)
    k = (steps[None, None, :] < durations[:, :, None]).astype(jnp.float32)
    C = circulant_last(k)  # [B, N, T, T]

    # mask lower diagonal: window starting at i may not wrap before i (loss.py:122-123)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    C = jnp.where((i > j)[None, None], 0.0, C)
    # drop truncated windows near the end (loss.py:124)
    C = jnp.where((C.sum(-1) < durations[:, :, None])[..., None], 0.0, C)
    # avoid boundary collapse (loss.py:127-128)
    C = C.at[..., 0].set(0.0)
    C = C.at[..., -1].set(0.0)
    # normalize to average-pool weights (loss.py:130-132)
    C = C / jnp.clip(C.sum(-1, keepdims=True), 1e-3)
    return C


def _two_way_softmax(logits_diag: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """softmax over sentences, /tau, softmax over time — the exclusion-principle
    approximation (loss.py:104,160).  logits_diag: [B, S, T, N]."""
    p = jax.nn.softmax(logits_diag, axis=-1) / temperature
    return jax.nn.softmax(p, axis=-2)


def _best_window_circulant(
    logits_diag: jnp.ndarray,  # [B, S, T, N], already pad-masked
    C: jnp.ndarray,  # [B, N, T, T]
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Materialized-kernel-bank form (the reference's circulant at
    loss.py:133-144).  Kept as the oracle for the cumsum fast path below."""
    prob = _two_way_softmax(logits_diag, temperature)
    prob_last = prob[:, -1]  # [B, T, N]
    logits_last = logits_diag[:, -1]  # [B, T, N]

    # prob_scan[b, n, i] = sum_j prob_last[b, j, n] * C[b, n, i, j]
    prob_scan = jnp.einsum("bjn,bnij->bni", prob_last, C)
    max_position = jnp.argmax(prob_scan, axis=-1)  # [B, N]
    max_prob = jnp.max(prob_scan, axis=-1)

    window = jnp.take_along_axis(
        C, max_position[:, :, None, None], axis=2
    )[:, :, 0]  # [B, N, T] avg-pool weights of the chosen window
    max_logits = jnp.einsum("btn,bnt->bn", logits_last, window)
    self_tgt_diag = (window > 0).astype(jnp.float32).transpose(0, 2, 1)  # [B, T, N]
    return self_tgt_diag, max_prob, max_logits


def _sliding_mean(x: jnp.ndarray, durations: jnp.ndarray):
    """Mean of x over window [i, i+d) ∩ [1, T-2] for every start i, as cumsum
    differences — O(B N T) instead of the O(B N T²) kernel bank.

    x [B, T, N], durations [B, N] (0 = padded sentence).
    Returns (scan [B, N, T], cnt [B, N, T], row_valid [B, N, T]).
    Exactly replicates the kernel-bank semantics: wrap-masked rows, truncated
    windows dropped (i + d > T), boundary positions 0 and T-1 excluded from
    every window, average over the REMAINING count.
    """
    B, T, N = x.shape
    xt = x.transpose(0, 2, 1)  # [B, N, T]
    pos = jnp.arange(T)
    keep = (pos >= 1) & (pos <= T - 2)  # boundary-position exclusion
    xk = jnp.where(keep[None, None, :], xt, 0.0)
    S = jnp.concatenate(
        [jnp.zeros((B, N, 1), xk.dtype), jnp.cumsum(xk, axis=-1)], axis=-1
    )  # [B, N, T+1]
    Sc = jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(keep.astype(jnp.float32))]
    )  # [T+1]

    i = pos[None, None, :]
    d = durations[:, :, None].astype(jnp.int32)
    end = jnp.minimum(i + d, T)
    scan_sum = jnp.take_along_axis(S, end, axis=-1) - jnp.take_along_axis(
        S, i.astype(jnp.int32) * jnp.ones_like(end), axis=-1
    )
    cnt = Sc[end] - Sc[i * jnp.ones_like(end)]
    row_valid = (i + d <= T) & (d > 0)
    scan = jnp.where(row_valid, scan_sum / jnp.clip(cnt, 1e-3), 0.0)
    return scan, cnt, row_valid


def _best_window_cumsum(
    logits_diag: jnp.ndarray,  # [B, S, T, N], already pad-masked
    durations: jnp.ndarray,  # [B, N] float (0 = padded)
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(B N T) cumsum form; bit-equivalent to the circulant bank (tested).

    MEASURED SLOWER on TPU v5e at T=64 (23 vs 30 cotrain steps/s): the
    take_along_axis gathers lower worse than the tiny [T,T] einsum the MXU
    eats for free.  Kept for CPU use and for long-T variants where the
    [B,N,T,T] bank stops fitting; the default stays circulant."""
    B, S, T, N = logits_diag.shape
    prob = _two_way_softmax(logits_diag, temperature)
    prob_scan, _, row_valid = _sliding_mean(prob[:, -1], durations)
    logit_scan, _, _ = _sliding_mean(logits_diag[:, -1], durations)

    max_position = jnp.argmax(prob_scan, axis=-1)  # [B, N]
    max_prob = jnp.max(prob_scan, axis=-1)
    max_logits = jnp.take_along_axis(
        logit_scan, max_position[:, :, None], axis=-1
    )[:, :, 0]

    pos = jnp.arange(T)[None, None, :]
    start = max_position[:, :, None]
    d = durations[:, :, None].astype(jnp.int32)
    keep = (pos >= 1) & (pos <= T - 2)
    chosen_valid = jnp.take_along_axis(
        row_valid, max_position[:, :, None], axis=-1
    )
    window = (pos >= start) & (pos < start + d) & keep & chosen_valid
    max_logits = jnp.where(chosen_valid[:, :, 0], max_logits, 0.0)
    self_tgt_diag = window.astype(jnp.float32).transpose(0, 2, 1)  # [B, T, N]
    return self_tgt_diag, max_prob, max_logits


def agreement_self_labelling(
    logits_joint_diag: jnp.ndarray,  # [B, S, T, N]
    logits_dual_diag: jnp.ndarray,  # [B, S, T, N]
    video_padding_mask: jnp.ndarray,  # [B, T] True = pad
    text_padding_mask: jnp.ndarray,  # [B, N] True = pad
    binary_tgt_raw: jnp.ndarray,  # [B, N, T]
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (agreement_tgt_diag [B, T, N] float, metrics dict).

    The caller expands the diag target to the [B,T,B,N] cross-batch form with an
    identity over videos (only same-video pairs are ever positive, loss.py:84-85).
    """
    mask_value = cfg.mask_value
    tau = cfg.temperature

    def pad_fill(x):
        x = jnp.where(video_padding_mask[:, None, :, None], mask_value, x)
        return jnp.where(text_padding_mask[:, None, None, :], mask_value, x)

    logits_joint_diag = pad_fill(logits_joint_diag.astype(jnp.float32))
    logits_dual_diag = pad_fill(logits_dual_diag.astype(jnp.float32))

    C = _window_kernel_bank(binary_tgt_raw, text_padding_mask)

    joint_tgt, _, joint_max_logits = _best_window_circulant(logits_joint_diag, C, tau)
    dual_tgt, _, dual_max_logits = _best_window_circulant(logits_dual_diag, C, tau)

    # dual/joint IoU per sentence (loss.py:182-186)
    inter = jnp.sum((joint_tgt > 0) & (dual_tgt > 0), axis=1).astype(jnp.float32)
    union = jnp.sum((joint_tgt > 0) | (dual_tgt > 0), axis=1).astype(jnp.float32)
    iou = inter / jnp.clip(union, 1e-5)  # [B, N]

    valid = ~text_padding_mask
    dual_conf = dual_max_logits >= masked_quantile(
        dual_max_logits, valid, cfg.confidence_quantile
    )
    joint_conf = joint_max_logits >= masked_quantile(
        joint_max_logits, valid, cfg.confidence_quantile
    )
    confidence_per_text = dual_conf & joint_conf
    confidence_iou = iou >= cfg.iou_threshold
    confidence_mask = confidence_per_text & confidence_iou  # [B, N]

    binary_diag = binary_tgt_raw.transpose(0, 2, 1).astype(jnp.float32)  # [B, T, N]
    inter_diag = ((joint_tgt > 0) & (dual_tgt > 0)).astype(jnp.float32)
    union_diag = ((joint_tgt > 0) | (dual_tgt > 0)).astype(jnp.float32)

    atype = cfg.temporal_agreement_type
    if atype == "i":
        agreement = jnp.where(confidence_mask[:, None, :], inter_diag, 0.0)
    elif atype == "u":
        agreement = jnp.where(confidence_mask[:, None, :], union_diag, 0.0)
    elif atype == "keep":
        # keep YouTube timestamps; replace by self-label where IoU confident
        # (loss.py:207-210)
        agreement = jnp.where(confidence_iou[:, None, :], union_diag, binary_diag)
    elif atype == "keep-joint":
        agreement = jnp.where(confidence_iou[:, None, :], joint_tgt, binary_diag)
    else:
        raise ValueError(atype)

    # exclusion: each timestep keeps only its first positive sentence
    # (loss.py:216-226); sentence 0's channel is restored afterwards and fully
    # dropped sentences fall back to the original targets — exact reference quirks.
    first_pos = jnp.argmax(agreement, axis=-1)  # [B, T]
    N = agreement.shape[-1]
    dedup = jnp.eye(N, dtype=agreement.dtype)[first_pos]  # one-hot [B, T, N]
    dedup = dedup.at[..., 0].set(agreement[..., 0])
    no_pos = jnp.sum(dedup, axis=1) == 0  # [B, N]
    dedup = jnp.where(no_pos[:, None, :], binary_diag, dedup)

    metrics = {
        "confidence-ratio": masked_mean(confidence_mask.astype(jnp.float32), valid),
        "iou-threshold": jnp.asarray(cfg.iou_threshold, jnp.float32),
    }
    return dedup, metrics
