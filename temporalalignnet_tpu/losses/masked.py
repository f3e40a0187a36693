"""Masked statistics with fixed shapes.

The reference compresses tensors with boolean indexing (e.g.
``x[~text_padding_mask]``, train/loss.py:192,241,286) — dynamic shapes that can't
live under jit.  These helpers compute the same statistics over a fixed-shape array
plus a validity mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean of x over elements where mask is True."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis)
    den = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return num / den


def masked_std(x: jnp.ndarray, mask: jnp.ndarray, axis=None, ddof: int = 1) -> jnp.ndarray:
    """Std over masked elements; ddof=1 matches torch.std's default (loss.py:281)."""
    m = mask.astype(x.dtype)
    n = jnp.sum(m, axis=axis)
    mean = masked_mean(x, mask, axis=axis)
    sq = jnp.sum(((x - mean) ** 2) * m, axis=axis)
    return jnp.sqrt(sq / jnp.maximum(n - ddof, 1.0))


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.quantile(x[mask], q) with linear interpolation, fixed shape.

    Invalid entries sort to +inf at the tail; with n = #valid the quantile sits at
    position q*(n-1) with linear interpolation between neighbors — exactly torch's
    'linear' (default) method used at loss.py:191-194,286,315-320.
    """
    x = x.reshape(-1).astype(jnp.float32)
    mask = mask.reshape(-1)
    filled = jnp.where(mask, x, jnp.inf)
    xs = jnp.sort(filled)
    n = jnp.sum(mask.astype(jnp.int32))
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(n - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    return xs[lo] * (1.0 - frac) + xs[hi] * frac
