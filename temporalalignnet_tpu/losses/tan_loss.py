"""Multi-layer MIL-NCE + thresholding + alignability BCE (reference: train/loss.py:55-373).

Fully fixed-shape: every boolean-compress in the reference
(``x[:, ~text_padding_mask]`` etc.) becomes arithmetic masking with -6e4 fill and
masked means, which is numerically identical in fp32 (exp(-6e4) == 0).

API: ``get_loss(outputs, batch, cfg) -> (loss, metrics)`` where
- outputs: model forward dict (+ 'ema-logits_dual'/'ema-logits_joint' for cotrain)
- batch: start [B,N], end [B,N] (seconds within the window),
  video_padding_mask [B,T], text_padding_mask [B,N] (True = pad),
  abs_text_pos [B,N,2] (start/end normalized by video length) or absent.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from temporalalignnet_tpu.core.config import LossConfig
from temporalalignnet_tpu.losses.agreement import agreement_self_labelling
from temporalalignnet_tpu.losses.masked import masked_mean, masked_quantile, masked_std


def mask_from_time(
    start: jnp.ndarray,  # [B, N] float seconds
    end: jnp.ndarray,  # [B, N]
    num_timestamps: int,
    text_padding_mask: Optional[jnp.ndarray] = None,  # [B, N] True = pad
) -> jnp.ndarray:
    """Binary [B, N, T]: 1 where start <= t < end (train/loss.py:26-41).

    The reference encodes padding via sentinel start/end values; here an explicit
    mask zeroes padded rows (same result).
    """
    steps = jnp.arange(num_timestamps, dtype=start.dtype)
    m = (start[..., None] <= steps) & (steps < end[..., None])
    if text_padding_mask is not None:
        m = m & ~text_padding_mask[..., None]
    return m


def _same_video_diagonal(logits: jnp.ndarray) -> jnp.ndarray:
    """[B,S,T,B,N] -> [B,S,T,N] same-video slice (loss.py:92-96 diagonal dance)."""
    return jnp.diagonal(logits, axis1=0, axis2=3).transpose(3, 0, 1, 2)


def _milnce_components(
    logits: jnp.ndarray,  # [B, S, T, B, N]
    pos_mask: jnp.ndarray,  # [B*T, B*N] bool — target positives (already col-valid)
    col_valid: jnp.ndarray,  # [B*N] bool — non-padded text columns
    mask_value: float,
):
    """Per-direction MIL-NCE elements (loss.py:240-275).

    Returns (v_loss_el [S, B*T], t_loss_el [S, B*N], row_mask [B*T], col_mask [B*N]).
    """
    B, S, T, _, N = logits.shape
    flat = logits.transpose(1, 0, 2, 3, 4).reshape(S, B * T, B * N)

    pos = jnp.where(pos_mask[None], flat, mask_value)
    neg = jnp.where(col_valid[None, None], flat, mask_value)

    v_num = jax.nn.logsumexp(pos, axis=-1)  # [S, B*T]
    v_den = jax.nn.logsumexp(neg, axis=-1)
    t_num = jax.nn.logsumexp(pos, axis=-2)  # [S, B*N]
    t_den = jax.nn.logsumexp(neg, axis=-2)

    row_mask = jnp.sum(pos_mask, axis=-1) > 0  # video positions with a positive
    col_mask = jnp.sum(pos_mask, axis=-2) > 0  # texts with a positive
    return v_den - v_num, t_den - t_num, row_mask, col_mask


def _bce_with_logits(logits, labels, pos_weight, sel_mask):
    """Masked binary_cross_entropy_with_logits with pos_weight (loss.py:345-351)."""
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    per_el = -(pos_weight * labels * log_sig + (1.0 - labels) * log_one_minus)
    return masked_mean(per_el, sel_mask)


def _diag_dual(vfeat, tfeat, inv_temp):
    """Same-video per-layer sims from dual features: [B,S,T,N]."""
    return (
        jnp.einsum("bstc,bnc->bstn", vfeat, tfeat, preferred_element_type=jnp.float32)
        * inv_temp
    )


def _diag_joint(vfeat, tfeat, inv_temp):
    """Same-video per-layer sims from joint features (per-layer text)."""
    return (
        jnp.einsum("bstc,bsnc->bstn", vfeat, tfeat, preferred_element_type=jnp.float32)
        * inv_temp
    )


def get_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    mesh=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    inv_temp = 1.0 / cfg.temperature if cfg.sim == "cos" else 1.0  # loss.py:65-70
    fused = cfg.use_fused_milnce
    if fused:
        # feature outputs (ModelConfig.fused_milnce): the cross-batch logits
        # never materialize; same-video diagonals are computed directly and the
        # logsumexps run in the Pallas kernel (ops/pallas_milnce.py)
        vfd = outputs["dual_feature_video"]  # [B, S, T, C]
        tfd = outputs["dual_feature_text"]  # [B, N, C]
        vfj = outputs["joint_feature_video"]  # [B, S, T, C]
        tfj = outputs["joint_feature_text"]  # [B, S, N, C]
        B, S, T, _ = vfd.shape
        N = tfd.shape[1]
        diag_dual = _diag_dual(vfd, tfd, inv_temp)
        diag_joint = _diag_joint(vfj, tfj, inv_temp)
    else:
        logits_dual = outputs["logits_dual"].astype(jnp.float32) * inv_temp
        logits_joint = outputs["logits_joint"].astype(jnp.float32) * inv_temp
        B, S, T, _, N = logits_dual.shape
        diag_dual = _same_video_diagonal(logits_dual)
        diag_joint = _same_video_diagonal(logits_joint)

    video_padding_mask = batch["video_padding_mask"].astype(bool)
    text_padding_mask = batch["text_padding_mask"].astype(bool)
    mv = cfg.mask_value

    metrics: Dict[str, jnp.ndarray] = {}

    binary_tgt_raw = mask_from_time(
        batch["start"].astype(jnp.float32),
        batch["end"].astype(jnp.float32),
        T,
        text_padding_mask,
    )  # [B, N, T]
    binary_diag = binary_tgt_raw.transpose(0, 2, 1).astype(jnp.float32)  # [B, T, N]

    if cfg.learn_agreement:
        if cfg.model == "cotrain":
            if fused:
                src_joint_diag = _diag_joint(
                    outputs["ema-joint_feature_video"],
                    outputs["ema-joint_feature_text"],
                    inv_temp,
                )
                src_dual_diag = _diag_dual(
                    outputs["ema-dual_feature_video"],
                    outputs["ema-dual_feature_text"],
                    inv_temp,
                )
            else:
                src_joint_diag = _same_video_diagonal(
                    outputs["ema-logits_joint"].astype(jnp.float32) * inv_temp
                )
                src_dual_diag = _same_video_diagonal(
                    outputs["ema-logits_dual"].astype(jnp.float32) * inv_temp
                )
        else:
            src_joint_diag, src_dual_diag = diag_joint, diag_dual
        tgt_diag, agree_metrics = agreement_self_labelling(
            jax.lax.stop_gradient(src_joint_diag),
            jax.lax.stop_gradient(src_dual_diag),
            video_padding_mask,
            text_padding_mask,
            binary_tgt_raw,
            cfg,
        )
        metrics.update(agree_metrics)
    else:
        tgt_diag = binary_diag

    # expand diag target to cross-batch [B*T, B*N] (only same-video positives,
    # loss.py:84-85)
    eye = jnp.eye(B, dtype=tgt_diag.dtype)
    tgt_cross = jnp.einsum("btn,bc->btcn", tgt_diag, eye).reshape(B * T, B * N)
    col_valid = (~text_padding_mask).reshape(B * N)
    pos_mask = (tgt_cross > 0) & col_valid[None]

    if fused:
        from temporalalignnet_tpu.ops.pallas_milnce import fused_milnce_elements

        v_el_dual, t_el_dual = fused_milnce_elements(
            vfd.transpose(1, 0, 2, 3).reshape(S, B * T, -1),
            tfd.reshape(B * N, -1),
            pos_mask, col_valid, mv, inv_temp, mesh=mesh,
        )
        v_el_joint, t_el_joint = fused_milnce_elements(
            vfj.transpose(1, 0, 2, 3).reshape(S, B * T, -1),
            tfj.transpose(1, 0, 2, 3).reshape(S, B * N, -1),
            pos_mask, col_valid, mv, inv_temp, mesh=mesh,
        )
        row_mask = jnp.sum(pos_mask, axis=-1) > 0
        col_mask = jnp.sum(pos_mask, axis=-2) > 0
    else:
        v_el_dual, t_el_dual, row_mask, col_mask = _milnce_components(
            logits_dual, pos_mask, col_valid, mv
        )
        v_el_joint, t_el_joint, _, _ = _milnce_components(
            logits_joint, pos_mask, col_valid, mv
        )
    loss_dual = (
        masked_mean(v_el_dual, jnp.broadcast_to(row_mask[None], v_el_dual.shape))
        + masked_mean(t_el_dual, jnp.broadcast_to(col_mask[None], t_el_dual.shape))
    ) / 2.0
    loss_joint = (
        masked_mean(v_el_joint, jnp.broadcast_to(row_mask[None], v_el_joint.shape))
        + masked_mean(t_el_joint, jnp.broadcast_to(col_mask[None], t_el_joint.shape))
    ) / 2.0

    metrics["loss-dual"] = loss_dual
    metrics["loss-joint"] = loss_joint

    loss_dual_final, loss_joint_final = loss_dual, loss_joint
    loss_bce_joint = None

    if cfg.loss_threshold > 0 or cfg.use_alignability_head:
        # per-text hardness from the last layer's same-video max logits
        # (loss.py:277-290); all statistics over valid (non-padded) texts
        valid_flat = col_valid  # [B*N]
        dual_diag_last = diag_dual[:, -1]  # [B, T, N]
        joint_diag_last = diag_joint[:, -1]
        max_dual = jnp.max(dual_diag_last, axis=1).reshape(B * N)
        max_joint = jnp.max(joint_diag_last, axis=1).reshape(B * N)
        max_dual = jax.lax.stop_gradient(max_dual)
        max_joint = jax.lax.stop_gradient(max_joint)

        def standardize(x):
            return (x - masked_mean(x, valid_flat)) / masked_std(x, valid_flat)

        t_th_metric = -(standardize(max_dual) + standardize(max_joint))
        t_th_mask = t_th_metric <= masked_quantile(
            t_th_metric, valid_flat, cfg.loss_threshold
        )  # [B*N]

        if cfg.loss_threshold > 0:
            metrics["loss-dual-all"] = loss_dual
            metrics["loss-joint-all"] = loss_joint

            pos_mask_th = pos_mask & t_th_mask[None]
            row_mask_th = jnp.sum(pos_mask_th, axis=-1) > 0
            t_sel = col_mask & t_th_mask & valid_flat

            loss_dual_final = (
                masked_mean(v_el_dual, jnp.broadcast_to(row_mask_th[None], v_el_dual.shape))
                + masked_mean(t_el_dual, jnp.broadcast_to(t_sel[None], t_el_dual.shape))
            ) / 2.0
            loss_joint_final = (
                masked_mean(v_el_joint, jnp.broadcast_to(row_mask_th[None], v_el_joint.shape))
                + masked_mean(t_el_joint, jnp.broadcast_to(t_sel[None], t_el_joint.shape))
            ) / 2.0
            metrics["loss-dual"] = loss_dual_final
            metrics["loss-joint"] = loss_joint_final

        if cfg.use_alignability_head:
            # pseudo alignability labels: 1 if both max logits above their medians,
            # 0 if both below, 2 = ignore (loss.py:308-323)
            med_dual = masked_quantile(max_dual, valid_flat, 0.5)
            med_joint = masked_quantile(max_joint, valid_flat, 0.5)
            labels = jnp.full((B * N,), 2.0, jnp.float32)
            labels = jnp.where((max_dual > med_dual) & (max_joint > med_joint), 1.0, labels)
            labels = jnp.where((max_dual < med_dual) & (max_joint < med_joint), 0.0, labels)

            if "abs_text_pos" in batch and batch["abs_text_pos"] is not None:
                # texts near the video boundary forced negative (loss.py:325-328)
                center = jnp.mean(batch["abs_text_pos"], axis=-1).reshape(B * N)
                trim = (center < 0.2) | (center > 0.8)
                labels = jnp.where(trim, 0.0, labels)

            sel = valid_flat & col_mask & (labels != 2.0)
            labels_sel_mean = masked_mean(labels, sel)
            pos_weight = 1.0 / jnp.clip(labels_sel_mean, 1e-6) - 1.0

            logit_dual_a = outputs["dual_logits_alignability"][..., 0].reshape(B * N)
            # the joint head trains on one specific layer (loss.py:341); clamp for
            # shallow configs (jax OOB indexing would silently drop the gradient)
            a_layer = min(
                cfg.alignability_layer, outputs["joint_logits_alignability"].shape[1] - 1
            )
            logit_joint_a = outputs["joint_logits_alignability"][
                :, a_layer, :, 0
            ].reshape(B * N)

            loss_bce_joint = _bce_with_logits(
                logit_joint_a.astype(jnp.float32), labels, pos_weight, sel
            )
            loss_bce_dual = _bce_with_logits(
                logit_dual_a.astype(jnp.float32), labels, pos_weight, sel
            )
            top1 = masked_mean(
                ((logit_joint_a > 0).astype(jnp.float32) == labels).astype(jnp.float32),
                sel,
            )
            metrics["loss-joint-bce"] = loss_bce_joint
            metrics["loss-dual-bce"] = loss_bce_dual
            metrics["alignability_top1"] = top1

    # final combination (loss.py:359-373)
    nce_weight = 0.0 if cfg.optim_policy == "bce" else 1.0
    bce_weight = 1.0
    if cfg.loss_threshold > 0:
        metrics["loss-total"] = (loss_dual + loss_joint) / 2.0
    loss = (loss_dual_final + loss_joint_final) / 2.0
    if cfg.use_alignability_head and loss_bce_joint is not None:
        loss = loss * nce_weight + bce_weight * loss_bce_joint
    metrics["loss"] = loss
    return loss, metrics
