"""AOT export (jax.export) of the eval forward: serialize -> deserialize ->
call must reproduce the live model exactly, for fixed and symbolic batch."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from temporalalignnet_tpu.core.config import ModelConfig
from temporalalignnet_tpu.models.net import TANWithText
from temporalalignnet_tpu.tools.export_eval import (
    export_eval_forward,
    main as export_main,
    roundtrip_check,
)

TINY = dict(
    width=64, heads=4, num_encoder_layers=2, num_joint_layers=2,
    video_embed_dim=48, num_pos_embeds=128,
)
T, N, W = 32, 4, 8


def _tiny_model():
    cfg = ModelConfig(use_alignability_head=True, random_pos_start=False,
                      **TINY)
    model = TANWithText(cfg, vocab_size=51)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(2, T, TINY["video_embed_dim"]), jnp.float32)
    ids = jnp.zeros((2, N, W), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        video, ids, deterministic=True,
    )["params"]
    return model, params


def test_fixed_batch_roundtrip():
    model, params = _tiny_model()
    exported = export_eval_forward(
        model, params, batch=4, seq_len=T,
        feature_dim=TINY["video_embed_dim"], sentences=N, words=W,
    )
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    diffs = roundtrip_check(
        blob, model, params, 4, T, TINY["video_embed_dim"], N, W
    )
    assert all(v == 0.0 for v in diffs.values()), diffs


def test_poly_batch_serves_multiple_sizes():
    model, params = _tiny_model()
    exported = export_eval_forward(
        model, params, batch=0, seq_len=T,
        feature_dim=TINY["video_embed_dim"], sentences=N, words=W,
        poly_batch=True,
    )
    blob = exported.serialize()
    for b in (2, 5):
        roundtrip_check(
            blob, model, params, b, T, TINY["video_embed_dim"], N, W
        )


def test_export_cli(tmp_path, capsys):
    out = tmp_path / "tan_eval.stablehlo"
    res = export_main([
        "--out", str(out), "--batch", "3",
        "--width", "64", "--heads", "4", "--layers", "2",
        "--vocab_size", "51", "--video_embed_dim", "48",
        "--seq_len", str(T), "--sentences", str(N), "--words", str(W),
    ])
    assert out.exists() and out.stat().st_size == res["bytes"]
    # the CLI's one printed line is machine-readable
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["path"] == str(out)
