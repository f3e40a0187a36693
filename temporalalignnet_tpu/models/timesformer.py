"""TimeSformer video tower (divided space-time attention) for the extractor.

The reference's htm_zoo extractor has an explicit ``timesformer`` branch that
runs the backbone at fps 8 over ``(b t) c h w -> b c t h w`` clips and saves
the backbone output feature
(/root/reference/htm_zoo/visual/extract_feature_template.py:266-269); the
InternVideo branch (:271-280) consumes the same clip layout.  This is the
TPU-native video-transformer tower for that slot: patch embedding per frame,
joint cls token, learned space + time positions, and per-layer divided
attention (temporal attention over the frame axis per patch, then spatial
attention per frame, then the MLP) exactly as TimeSformer defines it.

Weights convert from any HF ``TimesformerModel`` /
``TimesformerForVideoClassification`` state_dict through
checkpoint/timesformer_convert.py; activation parity vs torch is tested in
tests/test_timesformer.py.  Defaults are the published base variant
(width 768, 12 layers, patch 16, 8 frames, 224^2 -> 196 patches).

TPU notes: the divided attention is pure layout — both attention flavors are
batched [N, L, D] einsum attention with static shapes (L = frames or
patches+1), so XLA tiles them onto the MXU directly; the reshapes between
them are free relayouts.  The token order is patch-major / frame-minor
(index = 1 + p*T + t), matching the torch model bit-for-bit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# Original TimeSformer pixel normalization (facebookresearch/TimeSformer
# defaults DATA.MEAN/STD; the reference extractor normalizes with the
# wrapped model's own pixel_mean/pixel_std, extract_feature_template.py:268)
TIMESFORMER_PIXEL_MEAN = (0.45, 0.45, 0.45)
TIMESFORMER_PIXEL_STD = (0.225, 0.225, 0.225)


class _Attention(nn.Module):
    """Fused-QKV multi-head self-attention, [N, L, D] -> [N, L, D].

    Matches TimesformerSelfAttention + SelfOutput (one qkv Dense, logits
    scaled by head_dim**-0.5, proj Dense; dropout-free at inference).
    """

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, L, D = x.shape
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(N, L, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jnp.asarray(nn.softmax(logits, axis=-1), x.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, L, D)
        return nn.Dense(self.width, dtype=self.dtype, name="proj")(out)


class TimeSformerBlock(nn.Module):
    """One divided space-time layer (TimesformerLayer, divided_space_time).

    x is [B, 1 + P*T, D] with patch-major token order.  Temporal attention
    runs per patch over the T frames (no cls), feeds through temporal_dense
    into a residual; spatial attention runs per frame over the P patches
    with the layer's incoming cls replicated to every frame and the frame
    cls outputs mean-pooled back; the MLP closes the block.
    """

    width: int
    heads: int
    mlp_width: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_patches: int, n_frames: int):
        B, _, D = x.shape
        P, T = n_patches, n_frames
        ln = lambda name: nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name=name)

        # Temporal: per-patch attention over frames (modeling_timesformer.py
        # divided branch — cls excluded, residual through temporal_dense)
        tok = x[:, 1:].reshape(B * P, T, D)
        t = _Attention(self.width, self.heads, self.dtype, name="temporal_attn")(
            ln("temporal_ln")(tok)
        )
        t = nn.Dense(self.width, dtype=self.dtype, name="temporal_dense")(
            t.reshape(B, P * T, D)
        )
        tok = x[:, 1:] + t

        # Spatial: per-frame attention over patches, incoming cls replicated
        # to each frame, frame cls outputs averaged back to one token
        cls_init = x[:, :1]
        cls_rep = jnp.broadcast_to(cls_init[:, None], (B, T, 1, D)).reshape(B * T, 1, D)
        sp = tok.reshape(B, P, T, D).transpose(0, 2, 1, 3).reshape(B * T, P, D)
        sp = jnp.concatenate([cls_rep, sp], axis=1)
        s = _Attention(self.width, self.heads, self.dtype, name="attn")(
            ln("ln_before")(sp)
        )
        cls_out = s[:, 0].reshape(B, T, D).mean(axis=1, keepdims=True)
        res = s[:, 1:].reshape(B, T, P, D).transpose(0, 2, 1, 3).reshape(B, P * T, D)
        h = jnp.concatenate([cls_init, tok], axis=1) + jnp.concatenate(
            [cls_out, res], axis=1
        )

        # MLP (erf-gelu, HF hidden_act="gelu")
        m = nn.Dense(self.mlp_width, dtype=self.dtype, name="c_fc")(ln("ln_after")(h))
        m = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(
            nn.gelu(m, approximate=False)
        )
        return h + m


class TimeSformerEncoder(nn.Module):
    """Video transformer, channel-last [B, T, H, W, 3] -> features.

    ``return_cls=True`` gives the [B, width] backbone embedding (final-LN cls
    token, what the classification head consumes); ``False`` the full
    [B, 1+P*T, width] sequence (TimesformerModel.last_hidden_state).
    T must equal ``frames`` and H/W the trained grid — the learned time and
    position tables are not interpolated here (the reference extractor always
    feeds the trained 8-frame 224^2 layout).
    """

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    frames: int = 8
    mlp_width: int = 3072
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, return_cls: bool = True) -> jnp.ndarray:
        B, T, H, W, C = video.shape
        if T != self.frames:
            raise ValueError(f"expected {self.frames} frames, got {T}")
        p = self.patch_size
        x = nn.Conv(
            self.width, (p, p), strides=(p, p), dtype=self.dtype, name="patch_embed"
        )(video.reshape(B * T, H, W, C).astype(self.dtype))
        P = x.shape[1] * x.shape[2]
        x = x.reshape(B, T, P, self.width)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (self.width,))
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (P + 1, self.width)
        )
        time = self.param(
            "time_embedding", nn.initializers.zeros, (self.frames, self.width)
        )
        x = x + pos[1:].astype(x.dtype)
        # patch-major / frame-minor, then the time table per frame slot
        x = x.transpose(0, 2, 1, 3) + time.astype(x.dtype)
        x = x.reshape(B, P * T, self.width)
        cls_vec = (cls + pos[0]).astype(x.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_vec, (B, 1, self.width)), x], axis=1
        )

        for i in range(self.layers):
            x = TimeSformerBlock(
                self.width, self.heads, self.mlp_width, self.eps, self.dtype,
                name=f"layers_{i}",
            )(x, P, T)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln_post")(x)
        return x[:, 0] if return_cls else x


def preprocess_clip(frames) -> jnp.ndarray:
    """uint8 0-255 [..., H, W, 3] -> TimeSformer-normalized float32."""
    x = jnp.asarray(frames, jnp.float32) / 255.0
    mean = jnp.asarray(TIMESFORMER_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(TIMESFORMER_PIXEL_STD, jnp.float32)
    return (x - mean) / std
