"""Multi-head attention core: softmax(Q K^T / sqrt(dh) + key-pad bias) V.

Semantics match torch nn.MultiheadAttention with key_padding_mask (reference:
model/tfm_model.py:30-32): padded key positions are excluded from every query's
softmax.  Queries at padded positions still produce (garbage) outputs; the caller
masks them out downstream — identical to the reference.

Two paths:
- ``_attention_xla``: plain jnp; XLA fuses this well at the reference's tiny
  shapes (T=64 dual, T+N<=96 joint).
- ``fused_attention``: Pallas TPU kernel (grouped windows x heads per grid step,
  scores+softmax+PV in VMEM).  Bit-exact vs the XLA path on TPU hardware, but
  measured ~8% SLOWER end-to-end at TAN shapes (S<=96, D=64): XLA's own fusion
  already keeps the probability tensor on-chip here.  Kept as an opt-in
  (use_pallas=True) for larger variants where the [B,H,S,S] intermediate stops
  fitting XLA's fusion budget.  See temporalalignnet_tpu/ops/pallas_attention.py.
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
) -> jnp.ndarray:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_padding_mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
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
) -> jnp.ndarray:
    """[B, H, S, Dh] attention with optional [B, S] key padding mask (True=pad)."""
    if use_pallas:
        from temporalalignnet_tpu.ops.pallas_attention import fused_attention

        return fused_attention(q, k, v, key_padding_mask)
    return _attention_xla(q, k, v, key_padding_mask)
