"""CLIP-style ViT image tower for the feature extractor.

The reference's htm_zoo ships CLIP ViT-B/32 / L-14 features for HTM-Align
(htm_zoo/readme.md:17-28) and wraps the torch CLIP image encoder in its
extractor (/root/reference/htm_zoo/visual/extract_feature_template.py:236-307).
This is the TPU-native tower: the same pre-LN/QuickGELU transformer blocks the
TAN aligner uses (models/transformer.py — CLIP-style by construction), plus
patch embedding, class token, learned positions, and the projection head.
Weights come from any HF CLIPVisionModel(/WithProjection) checkpoint through
checkpoint/clip_convert.py (activation-parity tested in tests/test_clip_vit.py).

Defaults are ViT-B/32 (width 768, 12x12, patch 32, 512-d projection); L/14 is
CLIPImageEncoder(width=1024, layers=24, heads=16, patch_size=14, embed_dim=768).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from temporalalignnet_tpu.models.transformer import ResidualAttentionBlock

# CLIP's published pixel normalization (the extractor applies it on uint8 HWC
# frames before the encoder; reference preprocesses via clip.load's transform)
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPImageEncoder(nn.Module):
    """ViT image encoder, channel-last [B, H, W, 3] -> [B, embed_dim]."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 32
    embed_dim: int = 512  # projection output; 0 = return ln_post(cls) [width]
    dtype: jnp.dtype = jnp.float32
    # Must match the checkpoint's config.hidden_act: OpenAI CLIP releases use
    # 'quick_gelu'; LAION/OpenCLIP HF exports (e.g. ViT-H-14) use 'gelu'.
    # The converter maps weights only — a mismatch here silently corrupts
    # activations, so set this from the HF config when loading such towers.
    hidden_act: str = "quick_gelu"

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        B = images.shape[0]
        p = self.patch_size
        x = nn.Conv(
            self.width, (p, p), strides=(p, p), use_bias=False,
            dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, -1, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.width)), x],
            axis=1,
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (x.shape[1], self.width),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x, _ = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype,
                act=self.hidden_act, name=f"resblocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        if self.embed_dim:
            x = nn.Dense(
                self.embed_dim, use_bias=False, dtype=self.dtype, name="proj"
            )(x)
        return x


def preprocess_frames(frames) -> jnp.ndarray:
    """uint8 0-255 [..., H, W, 3] -> CLIP-normalized float32 (channel-last)."""
    x = jnp.asarray(frames, jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_PIXEL_STD, jnp.float32)
    return (x - mean) / std
