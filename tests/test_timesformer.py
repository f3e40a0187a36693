"""TimeSformer video tower: converter + activation parity vs torch.

The reference extractor's ``timesformer`` branch wraps the torch backbone at
fps 8 (htm_zoo/visual/extract_feature_template.py:266-269); parity here is on
RANDOM weights (no egress for the real checkpoint): an HF TimesformerModel
state_dict converts through timesformer_torch_to_params and the flax tower
reproduces torch's last_hidden_state, including the divided space-time token
routing (temporal attention per patch, spatial per frame, cls mean-pool).
"""

import numpy as np

from temporalalignnet_tpu.checkpoint import timesformer_torch_to_params
from temporalalignnet_tpu.models import TimeSformerEncoder

TINY = dict(
    image_size=32, patch_size=16, num_channels=3, num_frames=2,
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, attention_type="divided_space_time",
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    drop_path_rate=0.0,
)

FLAX_KW = dict(
    width=TINY["hidden_size"], layers=TINY["num_hidden_layers"],
    heads=TINY["num_attention_heads"], patch_size=TINY["patch_size"],
    frames=TINY["num_frames"], mlp_width=TINY["intermediate_size"],
)


def _tiny_torch_timesformer():
    import torch
    from transformers import TimesformerConfig, TimesformerModel

    torch.manual_seed(0)
    model = TimesformerModel(TimesformerConfig(**TINY)).eval()
    with torch.no_grad():  # zero-init tables would mask layout bugs
        for p in (model.embeddings.cls_token, model.embeddings.position_embeddings,
                  model.embeddings.time_embeddings):
            p.normal_(0.0, 0.02)
    return model


def test_conversion_and_activation_parity(rng):
    import jax.numpy as jnp
    import torch

    tm = _tiny_torch_timesformer()
    report = []
    params = timesformer_torch_to_params(tm.state_dict(), report)
    assert not [r for r in report if "unrecognized" in r], report

    enc = TimeSformerEncoder(**FLAX_KW)
    clip = rng.randn(
        3, TINY["num_frames"], TINY["image_size"], TINY["image_size"], 3
    ).astype(np.float32)
    seq = enc.apply({"params": params}, jnp.asarray(clip), return_cls=False)
    with torch.no_grad():
        ref = tm(
            pixel_values=torch.tensor(clip.transpose(0, 1, 4, 2, 3))
        ).last_hidden_state.numpy()
    assert seq.shape == ref.shape  # [B, 1 + P*T, D], patch-major order
    np.testing.assert_allclose(np.asarray(seq), ref, atol=2e-5, rtol=1e-4)

    # cls output == final-LN cls of the sequence
    cls = enc.apply({"params": params}, jnp.asarray(clip))
    np.testing.assert_allclose(np.asarray(cls), ref[:, 0], atol=2e-5, rtol=1e-4)


def test_classification_statedict_accepted():
    """A TimesformerForVideoClassification state_dict (timesformer.-prefixed,
    classifier head) converts with the head skipped, no unrecognized keys."""
    import torch
    from transformers import TimesformerConfig, TimesformerForVideoClassification

    torch.manual_seed(0)
    model = TimesformerForVideoClassification(
        TimesformerConfig(**TINY, num_labels=5)
    ).eval()
    report = []
    params = timesformer_torch_to_params(model.state_dict(), report)
    assert not [r for r in report if "unrecognized" in r], report
    assert "layers_0" in params and "classifier" not in params
    assert params["cls_token"].shape == (TINY["hidden_size"],)


def test_unknown_attention_keys_reported_not_raised():
    """Attention sub-keys outside the assumed qkv/output.dense layout (e.g. a
    fine-tune with split q/k/v projections) must follow the converter's
    unknown-key contract — appended to the report — not crash with KeyError."""
    import numpy as np_

    sd = {
        "encoder.layer.0.attention.attention.query.weight": np_.zeros((4, 4)),
        "encoder.layer.0.attention.relative_position": np_.zeros((4,)),
    }
    report = []
    params = timesformer_torch_to_params(sd, report)
    assert len([r for r in report if "unrecognized" in r]) == 2, report
    assert "layers_0" not in params


def test_extractor_hook_runs(rng):
    """make_timesformer_encoder: uint8 clips -> [B, width] backbone features,
    equal to torch on the same normalized pixels."""
    import torch

    from temporalalignnet_tpu.models.timesformer import preprocess_clip
    from temporalalignnet_tpu.tools.extract_features import (
        make_timesformer_encoder,
    )

    tm = _tiny_torch_timesformer()
    params = timesformer_torch_to_params(tm.state_dict())
    encode = make_timesformer_encoder(params, **FLAX_KW)
    clips = (rng.rand(2, TINY["num_frames"], 32, 32, 3) * 255).astype(np.uint8)
    feats = np.asarray(encode(clips))
    assert feats.shape == (2, TINY["hidden_size"])

    with torch.no_grad():
        pixels = np.asarray(preprocess_clip(clips)).transpose(0, 1, 4, 2, 3)
        ref = tm(pixel_values=torch.tensor(pixels)).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(feats, ref, atol=2e-5, rtol=1e-4)
