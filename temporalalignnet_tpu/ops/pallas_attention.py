"""Fused multi-head attention Pallas TPU kernel.

The TAN hot path runs attention at tiny sequence lengths (T=64 dual, T+N<=96
joint; reference model/tfm_model.py:30-32) over large window batches (the
overlap-seq eval flattens a whole video into a [num_windows, T] batch).  XLA's
generic lowering materializes the [B, H, S, S] probability tensor in HBM between
the two matmuls; this kernel keeps scores+softmax+PV for one batch row entirely
in VMEM — one grid step per window, all heads unrolled (H is a static 8).

Semantics == torch nn.MultiheadAttention with key_padding_mask (True = pad):
padded keys are excluded from every query's softmax; fully-padded query rows
produce finite garbage the caller masks downstream (same as the reference).

On non-TPU backends the kernel runs in interpreter mode so the CPU test suite
validates the exact kernel code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30  # finite fp32 mask bias; exact -inf breaks fully-masked rows


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One grid step = one batch row.  Blocks:
    q/k/v [1, H, S, D], bias [1, S] (0 valid / NEG_INF pad), out [1, H, S, D].
    """
    G, H, S, D = q_ref.shape
    scale = jax.lax.rsqrt(jnp.asarray(D, jnp.float32))
    bias = bias_ref[:, 0, :]  # [G, S]
    # f32 inputs: full-precision MXU passes (match XLA under any global
    # matmul-precision default); bf16: single-pass — Mosaic cannot lower the
    # multi-pass f32 emulation 'highest' would request for bf16 operands
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # fold windows x heads into one batched dot_general: G*H small [S, D]
    # tiles stream through the MXU in a single dispatch
    q = q_ref[...].reshape(G * H, S, D)
    k = k_ref[...].reshape(G * H, S, D)
    v = v_ref[...].reshape(G * H, S, D)
    scores = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        * scale
    ).reshape(G, H, S, S) + bias[:, None, None, :]
    scores = scores.reshape(G * H, S, S)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype).reshape(G, H, S, D)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                    dq_ref, dk_ref, dv_ref):
    """Backward for one window group: recompute scores+softmax (flash-style —
    nothing but q/k/v/bias is saved from the forward), then the four
    gradient matmuls, all in VMEM."""
    G, H, S, D = q_ref.shape
    scale = jax.lax.rsqrt(jnp.asarray(D, jnp.float32))
    bias = bias_ref[:, 0, :]  # [G, S]
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    bdot = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )

    q = q_ref[...].reshape(G * H, S, D)
    k = k_ref[...].reshape(G * H, S, D)
    v = v_ref[...].reshape(G * H, S, D)
    do = do_ref[...].reshape(G * H, S, D)

    scores = (bdot(q, k, ((2,), (2,))) * scale).reshape(G, H, S, S)
    scores = (scores + bias[:, None, None, :]).reshape(G * H, S, S)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [GH, S(q), S(k)] fp32

    # dV[k,d] = sum_q P[q,k] dO[q,d]   (P cast like the forward's PV matmul)
    dv = bdot(p.astype(do.dtype), do, ((1,), (1,)))
    # dP[q,k] = dO[q,:] . V[k,:]
    dp = bdot(do, v, ((2,), (2,)))
    # softmax VJP: dS = P * (dP - rowsum(dP * P));  masked keys have P ~ 0 so
    # no gradient leaks through the bias (matches the XLA where-mask autodiff)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = bdot(ds, k, ((2,), (1,))) * scale
    dk = bdot(ds, q, ((1,), (1,))) * scale

    dq_ref[...] = dq.astype(dq_ref.dtype).reshape(G, H, S, D)
    dk_ref[...] = dk.astype(dk_ref.dtype).reshape(G, H, S, D)
    dv_ref[...] = dv.astype(dv_ref.dtype).reshape(G, H, S, D)


def _pick_group(B: int, per_window: int, budget: int = 8 * 1024 * 1024) -> int:
    """Biggest group in {8,4,2,1} that divides B and fits the VMEM budget."""
    for g in (8, 4, 2):
        if B % g == 0 and g * per_window <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def _fused_attention_call(q, k, v, bias, interpret: bool, group: int):
    B, H, S, D = q.shape
    G = group
    blk = lambda: pl.BlockSpec(
        (G, H, S, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mha_kernel,
        grid=(B // G,),
        in_specs=[
            blk(),
            blk(),
            blk(),
            # bias rides as [B, 1, S]: TPU lowering needs the last two block
            # dims divisible by (8, 128) or equal to the array dims
            pl.BlockSpec((G, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=(4 * B * H * S * D + B * S) * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def _fused_attention_bwd_call(q, k, v, bias, do, interpret: bool, group: int):
    B, H, S, D = q.shape
    G = group
    blk = lambda: pl.BlockSpec(
        (G, H, S, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mha_bwd_kernel,
        grid=(B // G,),
        in_specs=[
            blk(), blk(), blk(),
            pl.BlockSpec((G, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            blk(),
        ],
        out_specs=(blk(), blk(), blk()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, H, S, D), a.dtype) for a in (q, k, v)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * S * S * D,
            bytes_accessed=(8 * B * H * S * D + B * S) * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(q, k, v, bias, do)


def _fwd_group(shape, itemsize: int) -> int:
    B, H, S, D = shape
    # double-buffered qkv blocks + out block + fp32 scores/probs
    per_window = H * S * D * itemsize * 8 + H * S * S * 4 * 3
    return _pick_group(B, per_window)


def _bwd_group(shape, itemsize: int) -> int:
    B, H, S, D = shape
    # 4 double-buffered input blocks + 3 output blocks + 4 fp32 [S,S] buffers
    per_window = H * S * D * itemsize * 11 + H * S * S * 4 * 4
    return _pick_group(B, per_window)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attention(interpret: bool, q, k, v, bias):
    return _fused_attention_call(
        q, k, v, bias, interpret, _fwd_group(q.shape, q.dtype.itemsize)
    )


def _fused_attention_fwd(interpret, q, k, v, bias):
    out = _fused_attention_call(
        q, k, v, bias, interpret, _fwd_group(q.shape, q.dtype.itemsize)
    )
    return out, (q, k, v, bias)


def _fused_attention_bwd(interpret, res, do):
    q, k, v, bias = res
    dq, dk, dv = _fused_attention_bwd_call(
        q, k, v, bias, do, interpret, _bwd_group(q.shape, q.dtype.itemsize)
    )
    # bias is derived from the (boolean) padding mask — no gradient
    return dq, dk, dv, jnp.zeros_like(bias)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jnp.ndarray,  # [B, H, S, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
) -> jnp.ndarray:
    """Drop-in replacement for ops.attention._attention_xla.  Differentiable:
    a custom VJP recomputes scores+softmax in a backward Pallas kernel
    (flash-style — only q/k/v/bias are saved), so ``use_pallas=True`` is legal
    inside ``jax.grad`` / the training step."""
    B, S = q.shape[0], q.shape[2]
    if key_padding_mask is None:
        bias = jnp.zeros((B, 1, S), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)[:, None, :]
    interpret = jax.default_backend() != "tpu"
    return _fused_attention(interpret, q, k, v, bias)
