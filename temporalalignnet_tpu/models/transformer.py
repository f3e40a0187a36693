"""CLIP-style pre-LN transformer encoder with per-layer taps.

Behavioral parity with reference model/tfm_model.py:17-55:
- block: x_norm = ln_1(x); x = x + attn(x_norm); x = x + mlp(ln_2(x)); QuickGELU MLP.
- the encoder returns per-layer intermediates: the ln_1-normalized *inputs* of
  layers 2..L plus the final (un-normalized) output — exactly the
  ``intermediate.pop(0); intermediate.append(x)`` dance at tfm_model.py:48-55.
  These taps feed the multi-layer MIL-NCE loss.

Layout is batch-first [B, S, D] (the reference permutes to torch's [S, B, D]; that
is a torch-ism, not semantics).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from temporalalignnet_tpu.ops.attention import multihead_attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) (reference tfm_model.py:11-13)."""
    return x * nn.sigmoid(1.702 * x)


def _kinit(std):
    """CLIP-style normal(std) kernel init; None = flax default (lecun)."""
    return nn.initializers.normal(stddev=std) if std else nn.linear.default_kernel_init


class MultiheadSelfAttention(nn.Module):
    """Self-attention with separate q/k/v projections (TP-shardable on heads).

    The torch reference packs QKV into one in_proj_weight [3D, D]
    (nn.MultiheadAttention); the checkpoint converter splits it into these three.
    Init stds follow the CLIP scaling applied at tan_model.py:85-97.
    """

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    attn_std: float = 0.0
    proj_std: float = 0.0
    causal: bool = False  # CLIP text tower; TAN blocks are bidirectional

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        B, S, D = x.shape
        dh = self.width // self.heads
        dense = lambda name, std: nn.Dense(
            self.width,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_kinit(std),
            bias_init=nn.initializers.zeros,
            name=name,
        )
        q = dense("q_proj", self.attn_std)(x).reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        k = dense("k_proj", self.attn_std)(x).reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        v = dense("v_proj", self.attn_std)(x).reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        out = multihead_attention(
            q, k, v, key_padding_mask,
            use_pallas=self.use_pallas, causal=self.causal,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return dense("out_proj", self.proj_std)(out)


class MLP(nn.Module):
    width: int
    ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    fc_std: float = 0.0
    proj_std: float = 0.0
    # TAN/CLIP blocks use QuickGELU; HF-CLIP checkpoints trained with
    # hidden_act='gelu' (e.g. LAION exports) need exact gelu instead.
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.width * self.ratio,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_kinit(self.fc_std),
            name="c_fc",
        )(x)
        h = quick_gelu(h) if self.act == "quick_gelu" else nn.gelu(h, approximate=False)
        return nn.Dense(
            self.width,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_kinit(self.proj_std),
            name="c_proj",
        )(h)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block returning (output, ln_1(input)) (tfm_model.py:34-38)."""

    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    attn_std: float = 0.0
    proj_std: float = 0.0
    fc_std: float = 0.0
    act: str = "quick_gelu"
    causal: bool = False

    def setup(self):
        self.attn = MultiheadSelfAttention(
            self.width,
            self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            attn_std=self.attn_std,
            proj_std=self.proj_std,
            causal=self.causal,
        )
        # torch LayerNorm eps = 1e-5
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        self.mlp = MLP(
            self.width,
            self.mlp_ratio,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fc_std=self.fc_std,
            proj_std=self.proj_std,
            act=self.act,
        )

    def __call__(self, x, key_padding_mask=None):
        x_norm = self.ln_1(x)
        x = x + self.attn(x_norm, key_padding_mask)
        x = x + self.mlp(self.ln_2(x))
        return x, x_norm

    def pre_norm(self, x):
        """Apply this block's ln_1 only (used for the per-layer tap of the
        previous block's output)."""
        return self.ln_1(x)


class ResidualDecoderBlock(nn.Module):
    """Self-attn -> cross-attn on memory -> MLP (reference tfm_model.py:59-87).

    Defined-but-unused in the reference forward (the 'D' in E6D6 is actually
    the joint encoder, SURVEY §2.1) — kept for API completeness and for
    variants that do want true cross-attention decoding.
    """

    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  use_pallas=self.use_pallas)
        self.self_attn = MultiheadSelfAttention(self.width, self.heads, **kw)
        self.attn = MultiheadCrossAttention(self.width, self.heads, **kw)
        ln = lambda: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.ln_1 = ln()
        self.ln_2 = ln()
        self.ln_3 = ln()
        self.mlp = MLP(self.width, self.mlp_ratio, dtype=self.dtype,
                       param_dtype=self.param_dtype)

    def __call__(self, x, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None):
        x_norm = self.ln_1(x)
        x = x + self.self_attn(x_norm, tgt_key_padding_mask)
        x = x + self.attn(self.ln_2(x), memory, memory_key_padding_mask)
        x = x + self.mlp(self.ln_3(x))
        return x, x_norm


class MultiheadCrossAttention(nn.Module):
    """Query from x, key/value from memory (torch MHA q!=kv form)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, memory, memory_key_padding_mask=None):
        B, S, D = x.shape
        M = memory.shape[1]
        dh = self.width // self.heads
        dense = lambda name: nn.Dense(
            self.width, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense("q_proj")(x).reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        k = dense("k_proj")(memory).reshape(B, M, self.heads, dh).transpose(0, 2, 1, 3)
        v = dense("v_proj")(memory).reshape(B, M, self.heads, dh).transpose(0, 2, 1, 3)
        from temporalalignnet_tpu.ops.attention import _attention_xla

        out = _attention_xla(q, k, v, memory_key_padding_mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return dense("out_proj")(out)


class TemporalDecoder(nn.Module):
    """Stack of decoder blocks with per-layer taps (tfm_model.py:89-103)."""

    width: int
    layers: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None) -> List[jnp.ndarray]:
        intermediate = []
        for i in range(self.layers):
            x, x_norm = ResidualDecoderBlock(
                self.width, self.heads, self.mlp_ratio,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resblocks_{i}",
            )(x, memory, tgt_key_padding_mask, memory_key_padding_mask)
            intermediate.append(x_norm)
        intermediate.pop(0)
        intermediate.append(x)
        return intermediate


class TemporalEncoder(nn.Module):
    """Stack of blocks; returns the per-layer intermediate list.

    Output list (length == layers):
      [ln_1^{(2)}(out_1), ln_1^{(3)}(out_2), ..., ln_1^{(L)}(out_{L-1}), out_L]
    i.e. each non-final layer's output normalized by the *next* block's ln_1
    (tfm_model.py:48-55).  The caller applies its own post-LN to the final element
    (tan_model.py:174, 206).
    """

    width: int
    layers: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    attn_std: float = 0.0
    proj_std: float = 0.0
    fc_std: float = 0.0
    # rematerialize each block in the backward pass (jax.checkpoint): drops
    # the per-block attention probs/MLP activations from HBM and recomputes
    # them when the gradient needs them — the standard TPU lever for growing
    # batch once weights+optimizer fit but activations don't.  Param tree and
    # numerics are unchanged (grad parity tested in test_train.py).
    remat: bool = False

    def setup(self):
        block_cls = (
            nn.remat(ResidualAttentionBlock) if self.remat
            else ResidualAttentionBlock
        )
        self.resblocks = [
            block_cls(
                self.width,
                self.heads,
                self.mlp_ratio,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                attn_std=self.attn_std,
                proj_std=self.proj_std,
                fc_std=self.fc_std,
                name=f"resblocks_{i}",
            )
            for i in range(self.layers)
        ]

    def __call__(self, x, key_padding_mask=None) -> List[jnp.ndarray]:
        intermediate = []
        for block in self.resblocks:
            x, x_norm = block(x, key_padding_mask)
            intermediate.append(x_norm)
        intermediate.pop(0)
        intermediate.append(x)
        return intermediate
