"""Flax -> torch reverse-converter tests (VERDICT r4 missing item #2).

The reference eco-system consumes ``.pth.tar`` dicts ``{epoch, state_dict,
best_acc, optimizer, iteration}`` (reference utils/utils.py:39-57,
train/main.py:446-484).  These tests prove the export half of interop:

- torch -> flax -> torch round trip is BITWISE at the dress-rehearsal (E6D6)
  scale, for the plain, twin (online.*/target.* + bert alias), and HF-BERT
  key spaces;
- a flax-TRAINED tiny model exported through tools/export_torch.py loads into
  the torch replica and the torch-side overlap-seq eval scores it to the SAME
  metrics as this repo's eval CLI reading the same exported .pth.tar.
"""

import numpy as np
import pytest
import torch

from test_dress_rehearsal import FULL, _torch_overlap_seq_eval, _write_corpus
from torch_replica import TorchTAN

from temporalalignnet_tpu.checkpoint import (
    flax_to_torch_state,
    load_reference_checkpoint,
    save_reference_checkpoint,
    split_twin_state_dict,
    torch_to_params,
)

# keys the importer drops because they never enter the reference forward
# (tan_model.py:68; torch_convert._DROPPED) — they have no flax-side value,
# so the reverse converter cannot (and must not) fabricate them
_UNUSED = {"mlp.weight", "mlp.bias"}


def _assert_bitwise(back, sd, dropped=_UNUSED):
    expect = {k for k in sd if k not in dropped}
    assert set(back) == expect
    for k in expect:
        got, want = np.asarray(back[k]), sd[k].numpy()
        assert got.shape == want.shape, k
        assert np.array_equal(got, want), k


@pytest.mark.slow
def test_round_trip_bitwise_full_scale():
    """torch -> flax -> torch at the released-checkpoint scale: every rule
    (QKV re-pack, kernel transpose, LayerNorm scale->weight) inverts exactly."""
    torch.manual_seed(5)
    tmodel = TorchTAN(**FULL)
    sd = tmodel.state_dict()
    back = flax_to_torch_state(torch_to_params(sd))
    _assert_bitwise(back, sd)


@pytest.mark.slow
def test_twin_round_trip_bitwise_full_scale():
    """Stage-2 twin key space: online.* + target.* + the module-level bert.*
    alias (tan_model.py:323 registers self.bert = self.online.bert, so the
    reference twin's state_dict carries all three)."""
    torch.manual_seed(6)
    online_sd = TorchTAN(**FULL).state_dict()
    torch.manual_seed(7)
    target_sd = TorchTAN(**FULL).state_dict()
    twin = {f"online.{k}": v for k, v in online_sd.items()}
    twin.update({f"target.{k}": v for k, v in target_sd.items()})
    twin.update({k: v for k, v in online_sd.items() if k.startswith("bert.")})

    on, tg = split_twin_state_dict(twin)
    back = flax_to_torch_state(torch_to_params(on), torch_to_params(tg))
    dropped = {f"{p}.{k}" for p in ("online", "target") for k in _UNUSED}
    _assert_bitwise(back, {k: v for k, v in twin.items()}, dropped)


def test_bert_round_trip_bitwise():
    """language_model='bert': the HF BertModel subtree under bert.* inverts
    bitwise (embeddings/LayerNorm/dense leaf rules; position_ids buffer is a
    non-parameter and is excluded on both directions)."""
    from transformers import BertConfig, BertModel

    torch.manual_seed(8)
    bcfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48,
    )
    tmodel = TorchTAN(
        width=64, heads=4, enc_layers=2, joint_layers=2, vdim=48,
        num_pos=128, text_dim=32, text_encoder=BertModel(bcfg),
    )
    sd = tmodel.state_dict()
    back = flax_to_torch_state(torch_to_params(sd))
    dropped = _UNUSED | {k for k in sd if k.endswith("position_ids")}
    _assert_bitwise(back, sd, dropped)

    # and the exported dict loads into a fresh reference-shaped module with
    # only the documented unused keys missing
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
        strict=False,
    )
    assert set(missing) <= dropped and unexpected == []


@pytest.mark.slow
def test_flax_trained_export_rescored_by_torch(tmp_path, rng):
    """The full interop loop: train a tiny TAN in flax -> save the orbax
    params_latest export -> tools/export_torch.py writes a .pth.tar -> the
    torch replica loads it and the torch-side overlap-seq eval equals this
    repo's eval CLI reading the SAME .pth.tar."""
    import jax.numpy as jnp

    from temporalalignnet_tpu.checkpoint import save_params
    from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
    from temporalalignnet_tpu.data import HTMAlignDataset
    from temporalalignnet_tpu.data.synthetic import synthetic_batch
    from temporalalignnet_tpu.eval.cli import main as eval_cli_main
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer
    from temporalalignnet_tpu.tools.export_torch import main as export_main
    from temporalalignnet_tpu.train.train_step import create_train_state, make_train_step

    # joint depth 3: the alignability head reads joint-layer tap index 2 on
    # both sides (HEAD_LAYER, eval_zeroshot_align.py:186)
    TINY = dict(width=64, heads=4, num_encoder_layers=2, num_joint_layers=3,
                video_embed_dim=48)
    words = np.array([f"w{i}" for i in range(50)])

    # --- train a few real steps (random_pos_start=False so eval-time torch
    # parity is deterministic)
    mcfg = ModelConfig(use_alignability_head=True, random_pos_start=False, **TINY)
    model = TANWithText(mcfg, vocab_size=len(words) + 1)
    batch = synthetic_batch(
        rng, batch_size=4, seq_len=32, max_sentences=4,
        feature_dim=TINY["video_embed_dim"], vocab_size=len(words), max_words=8,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    lcfg = LossConfig(use_alignability_head=True)
    tcfg = TrainConfig(lr=1e-3, warmup_iterations=2, total_iterations=10)
    state, tx = create_train_state(model, tcfg, lcfg, batch, seed=0)
    step = make_train_step(model, tx, tcfg, lcfg)
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    exp_dir = tmp_path / "exp"
    exp_dir.mkdir()
    save_params(str(exp_dir / "params_latest"), state.params)

    # --- export CLI (experiment-dir form)
    out_path = str(tmp_path / "export_tiny.pth.tar")
    export_main(["--params", str(exp_dir), "--out", out_path,
                 "--epoch", "1", "--iteration", "3"])

    ckpt = torch.load(out_path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 1 and ckpt["iteration"] == 3
    assert set(ckpt) == {"epoch", "state_dict", "best_acc", "optimizer",
                         "iteration"}

    # --- torch replica consumes the export
    tmodel = TorchTAN(
        width=TINY["width"], heads=TINY["heads"],
        enc_layers=TINY["num_encoder_layers"],
        joint_layers=TINY["num_joint_layers"],
        vdim=TINY["video_embed_dim"], vocab_words=len(words),
    ).eval()
    missing, unexpected = tmodel.load_state_dict(ckpt["state_dict"], strict=False)
    assert set(missing) <= _UNUSED and unexpected == []

    # --- the export round-trips through the IMPORT converter bitwise
    reloaded = load_reference_checkpoint(out_path, verbose=False)
    flat = lambda t: {
        "/".join(map(str, p)): np.asarray(l)
        for p, l in _flatten_tree(t)
    }
    a, b = flat(state.params), flat(reloaded["params"])
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(a[k], b[k]), k

    # --- both sides score the same corpus to the same metrics
    feat_dir, anno_path, vocab_path = _write_corpus(
        tmp_path, rng, words=words, vdim=TINY["video_embed_dim"]
    )
    out = eval_cli_main([
        "--task", "align", "--ckpt", out_path,
        "--features", feat_dir, "--anno", anno_path, "--vocab", vocab_path,
        "--width", str(TINY["width"]), "--heads", str(TINY["heads"]),
        "--num_encoder_layers", str(TINY["num_encoder_layers"]),
        "--num_joint_layers", str(TINY["num_joint_layers"]),
        "--video_embed_dim", str(TINY["video_embed_dim"]),
        "--f32",
    ])
    tok = Word2VecTokenizer(vocab_path)
    corpus = list(HTMAlignDataset(feat_dir, anno_path, tok))
    oracle, _ = _torch_overlap_seq_eval(tmodel, corpus)
    assert out["Recall"] == pytest.approx(oracle["Recall"], abs=1e-9)
    assert out["AUC"] == pytest.approx(oracle["AUC"], abs=1e-4)


def test_twin_export_cli(tmp_path, rng):
    """export_torch with ema_latest present writes the twin key space and the
    import converter reads params/ema back bitwise."""
    import jax.numpy as jnp

    from temporalalignnet_tpu.checkpoint import save_params
    from temporalalignnet_tpu.tools.export_torch import main as export_main

    params = {"aligner": {"binary_head": {
        "kernel": jnp.asarray(rng.randn(8, 1), jnp.float32),
        "bias": jnp.zeros((1,), jnp.float32),
    }}}
    ema = {"aligner": {"binary_head": {
        "kernel": jnp.asarray(rng.randn(8, 1), jnp.float32),
        "bias": jnp.ones((1,), jnp.float32),
    }}}
    exp = tmp_path / "exp"
    exp.mkdir()
    save_params(str(exp / "params_latest"), params)
    save_params(str(exp / "ema_latest"), ema)

    out_path = str(tmp_path / "twin.pth.tar")
    export_main(["--params", str(exp), "--out", out_path])
    sd = torch.load(out_path, map_location="cpu", weights_only=False)["state_dict"]
    assert set(sd) == {"online.binary_head.weight", "online.binary_head.bias",
                       "target.binary_head.weight", "target.binary_head.bias"}

    loaded = load_reference_checkpoint(out_path, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["aligner"]["binary_head"]["kernel"]),
        np.asarray(params["aligner"]["binary_head"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["ema_params"]["aligner"]["binary_head"]["bias"]),
        np.asarray(ema["aligner"]["binary_head"]["bias"]))


def _flatten_tree(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_tree(v, path + (k,))
    else:
        yield path, tree
