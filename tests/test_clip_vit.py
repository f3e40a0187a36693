"""CLIP ViT image tower: converter + activation parity vs torch CLIP.

Reference wraps torch CLIP in its extractor
(htm_zoo/visual/extract_feature_template.py:236-307) and releases B/32 + L/14
HTM features (htm_zoo/readme.md:17-28).  Parity here is on RANDOM weights
(no egress for the real checkpoint): an HF CLIPVisionModelWithProjection
state_dict converts through clip_vision_torch_to_params and the flax tower
reproduces torch activations.
"""

import numpy as np
import pytest

from temporalalignnet_tpu.checkpoint import clip_vision_torch_to_params
from temporalalignnet_tpu.models import CLIPImageEncoder

TINY = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, image_size=32, patch_size=16, projection_dim=24,
    hidden_act="quick_gelu",  # original CLIP activation
    attention_dropout=0.0,
)


def _tiny_torch_clip():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(0)
    return CLIPVisionModelWithProjection(CLIPVisionConfig(**TINY)).eval()


def test_conversion_and_activation_parity(rng):
    import jax.numpy as jnp
    import torch

    tm = _tiny_torch_clip()
    report = []
    params = clip_vision_torch_to_params(tm.state_dict(), report)
    assert not [r for r in report if "unrecognized" in r], report

    enc = CLIPImageEncoder(
        width=TINY["hidden_size"], layers=TINY["num_hidden_layers"],
        heads=TINY["num_attention_heads"], patch_size=TINY["patch_size"],
        embed_dim=TINY["projection_dim"],
    )
    imgs = rng.randn(3, TINY["image_size"], TINY["image_size"], 3).astype(np.float32)
    out = enc.apply({"params": params}, jnp.asarray(imgs))
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref.image_embeds.numpy(), atol=2e-5, rtol=1e-4
    )


def test_gelu_variant_activation_parity(rng):
    """LAION/OpenCLIP-style HF exports set hidden_act='gelu'; the flax tower
    must honor it (hidden_act=...) — the converter maps weights only, so an
    activation mismatch would convert cleanly yet corrupt features."""
    import jax.numpy as jnp
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(1)
    cfg = dict(TINY, hidden_act="gelu")
    tm = CLIPVisionModelWithProjection(CLIPVisionConfig(**cfg)).eval()
    params = clip_vision_torch_to_params(tm.state_dict())

    imgs = rng.randn(2, TINY["image_size"], TINY["image_size"], 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)))

    def run(act):
        enc = CLIPImageEncoder(
            width=TINY["hidden_size"], layers=TINY["num_hidden_layers"],
            heads=TINY["num_attention_heads"], patch_size=TINY["patch_size"],
            embed_dim=TINY["projection_dim"], hidden_act=act,
        )
        return np.asarray(enc.apply({"params": params}, jnp.asarray(imgs)))

    np.testing.assert_allclose(
        run("gelu"), ref.image_embeds.numpy(), atol=2e-5, rtol=1e-4
    )
    # and the default quick_gelu tower genuinely diverges on these weights
    assert np.abs(run("quick_gelu") - ref.image_embeds.numpy()).max() > 1e-3


def test_extractor_hook_runs(rng):
    """make_clip_encoder: [B, T, H, W, 3] uint8 frames -> L2-normalized [B, E]."""
    import torch

    from temporalalignnet_tpu.tools.extract_features import make_clip_encoder

    tm = _tiny_torch_clip()
    params = clip_vision_torch_to_params(tm.state_dict())
    encode = make_clip_encoder(
        params,
        width=TINY["hidden_size"], layers=TINY["num_hidden_layers"],
        heads=TINY["num_attention_heads"], patch_size=TINY["patch_size"],
        embed_dim=TINY["projection_dim"],
    )
    frames = (rng.rand(2, 3, 32, 32, 3) * 255).astype(np.uint8)
    feats = np.asarray(encode(frames))
    assert feats.shape == (2, TINY["projection_dim"])
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)

    # the mean-pool over the T in-second frames matches pooling per-frame
    # torch embeddings (CLIP preprocessing included)
    from temporalalignnet_tpu.models.clip_vit import preprocess_frames

    with torch.no_grad():
        per_frame = tm(
            pixel_values=torch.tensor(
                np.asarray(preprocess_frames(frames.reshape(6, 32, 32, 3)))
                .transpose(0, 3, 1, 2)
            )
        ).image_embeds.numpy().reshape(2, 3, -1)
    pooled = per_frame.mean(1)
    pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8
    np.testing.assert_allclose(feats, pooled, atol=2e-5, rtol=1e-4)


def test_full_clipmodel_statedict_accepted():
    """A full CLIPModel state_dict (text tower + logit_scale included)
    converts with the text side skipped, no unrecognized-key noise."""
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(
            vocab_size=50, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=12, projection_dim=24,
        ),
        CLIPVisionConfig(**TINY),
        projection_dim=24,
    )
    model = CLIPModel(cfg).eval()
    report = []
    params = clip_vision_torch_to_params(model.state_dict(), report)
    assert not [r for r in report if "unrecognized" in r], report
    assert "proj" in params and "resblocks_0" in params
