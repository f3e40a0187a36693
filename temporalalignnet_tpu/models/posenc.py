"""Positional encodings.

Behavioral parity targets:
- table-form sine embedding (reference: model/tfm_model.py:137-148)
- linear interpolation of the positional table for eval windows != train length
  (reference: model/tan_model.py:157-160 uses F.interpolate(mode='linear',
  align_corners=False))
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding(
    feature_dim: int = 512, num_features: int = 1024, temperature: float = 10000.0
) -> jnp.ndarray:
    """[num_features, feature_dim] sine table (tfm_model.py:137-148 semantics)."""
    scale = 2 * math.pi
    eps = 1e-6
    pos = jnp.arange(num_features, dtype=jnp.float32)
    pos = pos / (pos[-1] + eps) * scale
    dim_t = jnp.arange(feature_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / feature_dim)
    ang = pos[:, None] / dim_t  # [P, D]
    # interleave sin of even channels with cos of odd channels
    emb = jnp.stack((jnp.sin(ang[:, 0::2]), jnp.cos(ang[:, 1::2])), axis=2)
    return emb.reshape(num_features, feature_dim)


def position_embedding_sine_from_mask(
    padding_mask: jnp.ndarray,  # [B, T] True = pad
    feature_dim: int = 512,
    temperature: float = 10000.0,
    normalize: bool = True,
) -> jnp.ndarray:
    """Mask-driven 1-D DETR-style sine embedding (reference tfm_model.py:106-134):
    positions count only non-padded steps, optionally normalized to [0, 2π] per
    sequence.  Returns [B, T, feature_dim]."""
    not_mask = (~padding_mask).astype(jnp.float32)
    pos = jnp.cumsum(not_mask, axis=1)  # 1-indexed positions over valid steps
    if normalize:
        eps = 1e-6
        pos = pos / (pos[:, -1:] + eps) * (2 * math.pi)
    dim_t = jnp.arange(feature_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / feature_dim)
    ang = pos[:, :, None] / dim_t  # [B, T, D]
    emb = jnp.stack((jnp.sin(ang[:, :, 0::2]), jnp.cos(ang[:, :, 1::2])), axis=3)
    return emb.reshape(*pos.shape, feature_dim)


def linear_interpolate(table: jnp.ndarray, out_len: int, effective_len=None) -> jnp.ndarray:
    """1-D linear resize along axis 0, matching torch F.interpolate(align_corners=False).

    table: [L_src, D] -> [out_len, D].

    ``effective_len`` (traced scalar) supports padded fixed-shape batches: the
    resize targets the first effective_len rows (positions beyond it are garbage
    and must be masked by the caller).  This keeps the reference's
    exact-length interpolation semantics (tan_model.py:157-160) under jit when
    variable-length videos are padded to a bucket.
    """
    src_len = table.shape[0]
    if effective_len is None:
        scale = src_len / out_len
    else:
        scale = src_len / jnp.asarray(effective_len, jnp.float32)
    # source coordinate of each output sample (half-pixel centers)
    coords = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, src_len - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src_len - 1)
    w = (coords - lo.astype(jnp.float32))[:, None]
    return table[lo] * (1.0 - w) + table[hi] * w
