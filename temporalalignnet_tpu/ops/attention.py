"""Multi-head attention core: softmax(Q K^T / sqrt(dh) + key-pad bias) V.

Semantics match torch nn.MultiheadAttention with key_padding_mask (reference:
model/tfm_model.py:30-32): padded key positions are excluded from every query's
softmax.  Queries at padded positions still produce (garbage) outputs; the caller
masks them out downstream — identical to the reference.

Two paths:
- ``_attention_xla``: plain jnp; XLA fuses this well at the reference's tiny
  shapes (T=64 dual, T+N<=96 joint).
- ``fused_attention``: Pallas TPU kernel (grouped windows x heads per grid step,
  scores+softmax+PV in VMEM) with a custom-VJP backward kernel, so it is legal
  in training.  Bit-exact vs the XLA path on TPU hardware.  Measured (v5e):
  ~8% SLOWER at TAN shapes with window batches <= 384 — XLA's own fusion keeps
  the probability tensor on-chip there — but at flat window batches >= 512 the
  joint encoder's [B,H,72,72] fp32 probs (>~50 MB) exceed XLA's fusion budget
  and spill to HBM: the kernel then wins big (10.3k -> 13.1k eval windows/s at
  B=512).  The vmapped corpus-eval canvas is NOT attention-bound (XLA 5.1 s vs
  pallas 5.8 s per 80-video corpus), so XLA stays the default everywhere;
  enable use_pallas for flat-batched eval at B >= 512.
  See temporalalignnet_tpu/ops/pallas_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _attention_xla(
    q: jnp.ndarray,  # [B, H, S, Dh]
    k: jnp.ndarray,  # [B, H, S, Dh]
    v: jnp.ndarray,  # [B, H, S, Dh]
    key_padding_mask: Optional[jnp.ndarray],  # [B, S] True = pad
    causal: bool = False,
) -> jnp.ndarray:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    if causal:
        # CLIP text-tower semantics (torch builds an additive -inf upper
        # triangle; HF CLIPTextTransformer's _create_4d_causal_attention_mask)
        S = scores.shape[-1]
        keep = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(keep[None, None], scores, neg)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """[B, H, S, Dh] attention with optional [B, S] key padding mask (True=pad).

    ``causal`` adds the CLIP-text lower-triangular mask; only the XLA path
    implements it (the Pallas kernel targets the TAN eval shapes — the text
    tower's S=77 is far below where the kernel ever wins, so causal silently
    takes the XLA path rather than growing the kernel).
    """
    if use_pallas and not causal:
        from temporalalignnet_tpu.ops.pallas_attention import fused_attention

        return fused_attention(q, k, v, key_padding_mask)
    return _attention_xla(q, k, v, key_padding_mask, causal=causal)
