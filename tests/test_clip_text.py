"""CLIP text tower: converter + activation parity vs torch, BPE tokenizer
parity vs HF, and the RawFeatureBaseline CLIP-mode integration.

The reference's CLIP baseline encodes HTM-Align captions at eval time with
clip.tokenize + clipmodel.encode_text (eval/eval_zeroshot_align.py:294-327).
Parity is on RANDOM weights / a synthetic tiny BPE vocab (no egress for the
real checkpoint or bpe_simple_vocab_16e6.txt.gz).
"""

import json
import os

import numpy as np
import pytest

from temporalalignnet_tpu.checkpoint import clip_text_torch_to_params
from temporalalignnet_tpu.models import CLIPTextEncoder, CLIPTokenizer
from temporalalignnet_tpu.models.clip_text import EOT, SOT, bytes_to_unicode

TINY = dict(
    vocab_size=99, hidden_size=32, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, max_position_embeddings=16, projection_dim=24,
    hidden_act="quick_gelu", attention_dropout=0.0,
    eos_token_id=98, bos_token_id=97, pad_token_id=98,
)


def _tiny_torch_text(**over):
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(0)
    cfg = dict(TINY, **over)
    return CLIPTextModelWithProjection(CLIPTextConfig(**cfg)).eval(), cfg


def _ids(rng, B=3, L=12):
    """BOS-led sequences with one EOS (=98, the highest id present) each, so
    OpenAI argmax pooling and HF first-eos pooling select the same position."""
    ids = rng.randint(1, 96, size=(B, L)).astype(np.int64)
    ids[:, 0] = TINY["bos_token_id"]
    for b, pos in enumerate(rng.randint(2, L, size=B)):
        ids[b, pos] = TINY["eos_token_id"]
        ids[b, pos + 1:] = 0
    return ids


@pytest.mark.parametrize("hidden_act", ["quick_gelu", "gelu"])
@pytest.mark.parametrize("pooling", ["hf_eos", "openai_argmax"])
def test_conversion_and_activation_parity(rng, hidden_act, pooling):
    import jax.numpy as jnp
    import torch

    tm, cfg = _tiny_torch_text(hidden_act=hidden_act)
    report = []
    params = clip_text_torch_to_params(tm.state_dict(), report)
    assert not [r for r in report if "unrecognized" in r], report

    ids = _ids(rng)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).text_embeds.numpy()

    enc = CLIPTextEncoder(
        vocab_size=cfg["vocab_size"], context_length=cfg["max_position_embeddings"],
        width=cfg["hidden_size"], layers=cfg["num_hidden_layers"],
        heads=cfg["num_attention_heads"], embed_dim=cfg["projection_dim"],
        hidden_act=hidden_act,
        # the EOS token is the highest id in every row, so both published
        # pooling semantics pick the same position (as in real CLIP vocabs,
        # where EOT=49407 is the max id)
        eos_token_id=cfg["eos_token_id"] if pooling == "hf_eos" else None,
    )
    out = enc.apply({"params": params}, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_causal_mask_blocks_future_tokens(rng):
    """Changing a token AFTER the pooled position must not change the output
    (causal attention); changing one BEFORE it must."""
    import jax.numpy as jnp

    enc = CLIPTextEncoder(vocab_size=50, context_length=10, width=16, layers=1,
                          heads=2, embed_dim=8, eos_token_id=49)
    ids = np.array([[48, 5, 6, 49, 1, 1, 1, 1, 1, 1]], np.int32)
    params = enc.init(__import__("jax").random.PRNGKey(0), jnp.asarray(ids))["params"]

    base = np.asarray(enc.apply({"params": params}, jnp.asarray(ids)))
    after = ids.copy(); after[0, 7] = 30  # past the EOS pool position
    before = ids.copy(); before[0, 2] = 30
    np.testing.assert_array_equal(
        base, np.asarray(enc.apply({"params": params}, jnp.asarray(after)))
    )
    assert np.abs(
        base - np.asarray(enc.apply({"params": params}, jnp.asarray(before)))
    ).max() > 1e-6


def _tiny_bpe_files(tmp_path):
    """Byte-complete tiny vocab + a few real merges, HF vocab.json/merges.txt."""
    chars = sorted(set(bytes_to_unicode()[b] for b in range(256)))
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
              ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
              ("1", "2")]
    vocab_list = chars + [c + "</w>" for c in chars]
    vocab_list += ["".join(m) for m in merges] + [SOT, EOT]
    vocab = {t: i for i, t in enumerate(vocab_list)}
    vf = os.path.join(tmp_path, "vocab.json")
    mf = os.path.join(tmp_path, "merges.txt")
    with open(vf, "w") as f:
        json.dump(vocab, f)
    with open(mf, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    return vf, mf, merges


def test_tokenizer_matches_hf(tmp_path):
    from transformers import CLIPTokenizer as HFTokenizer

    vf, mf, _ = _tiny_bpe_files(str(tmp_path))
    ours = CLIPTokenizer(vf, mf, context_length=16)
    hf = HFTokenizer(vf, mf)
    for s in ["Hello, world!", "hello hello WORLD", "a 123 b",
              "  spaced   out  ", "don't stop", "hello" * 20]:
        mine = [ours.sot_id] + ours.encode(s) + [ours.eot_id]
        assert mine == hf(s)["input_ids"], s


def test_tokenizer_fixed_shape_and_truncation(tmp_path):
    vf, mf, _ = _tiny_bpe_files(str(tmp_path))
    tok = CLIPTokenizer(vf, mf, context_length=8)
    out = tok(["hello world", "hello " * 30])
    assert out["input_ids"].shape == (2, 8)
    # row 0: sot hello world eot pad... — mask marks the 4 real tokens
    assert out["attention_mask"][0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    # truncation keeps EOT in the last slot (clip.tokenize truncate=True)
    assert out["input_ids"][1, -1] == tok.eot_id
    assert out["attention_mask"][1].all()
    # pad id 0 is a real byte token; mask must come from lengths, not ids != 0
    assert tok.encoder[bytes_to_unicode()[ord("!")]] == 0


def test_openai_bpe_construction_matches_hf_style(tmp_path):
    vf, mf, merges = _tiny_bpe_files(str(tmp_path))
    obpe = os.path.join(str(tmp_path), "bpe.txt")
    with open(obpe, "w") as f:
        f.write("banner\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    a = CLIPTokenizer(vf, mf)
    b = CLIPTokenizer.from_openai_bpe(obpe)
    assert a.vocab_size == b.vocab_size
    for s in ["hello world 12", "mixed CASE?"]:
        assert a.encode(s) == b.encode(s)


def test_eval_cli_clip_baseline(tmp_path, rng):
    """disk -> eval CLI --clip_text_ckpt/--clip_vocab/--clip_merges -> metrics,
    equal to a direct library-path run of the same baseline (the CLIP rows of
    BASELINE.md end-to-end; reference eval_zeroshot_align.py:294-330)."""
    import jax
    import jax.numpy as jnp
    import torch

    from temporalalignnet_tpu.checkpoint import neq_merge
    from temporalalignnet_tpu.core.config import EvalConfig, ModelConfig
    from temporalalignnet_tpu.data import HTMAlignDataset
    from temporalalignnet_tpu.eval.align import AlignmentEvaluator
    from temporalalignnet_tpu.eval.cli import main as eval_cli_main
    from temporalalignnet_tpu.models import RawFeatureBaseline

    vf, mf, _ = _tiny_bpe_files(str(tmp_path))
    tok = CLIPTokenizer(vf, mf, context_length=16)
    # the checkpoint's vocab must match the tokenizer's (as real CLIP's does;
    # EOT = the highest id, so default argmax pooling applies)
    tm, cfg = _tiny_torch_text(
        vocab_size=tok.vocab_size,
        bos_token_id=tok.sot_id, eos_token_id=tok.eot_id,
        pad_token_id=tok.eot_id,
    )
    ckpt = tmp_path / "clip_text.pth"
    torch.save(tm.state_dict(), ckpt)
    E = cfg["projection_dim"]

    # tiny HTM-Align-format corpus with ASCII captions
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    words = ["hello", "world", "cut", "the", "mix", "12", "pan!"]
    anno = {}
    for v in range(2):
        vid = f"clip{v:02d}"
        vlen = int(rng.randint(70, 90))
        np.save(feat_dir / f"{vid}.npy",
                (rng.randn(vlen, E) * 0.5).astype(np.float32))
        sents, t = [], 2.0
        for _ in range(4):
            end = min(t + float(rng.randint(4, 10)), vlen - 1.0)
            text = " ".join(np.random.RandomState(v).choice(words, 4))
            sents.append([int(rng.rand() < 0.5), float(t), float(end), text])
            t = end + 2.0
        sents[0][0], sents[-1][0] = 1, 0  # AUC needs both classes
        anno[vid] = sents
    anno_path = tmp_path / "htm_align.json"
    anno_path.write_text(json.dumps(anno))

    out = eval_cli_main([
        "--task", "align",
        "--features", str(feat_dir), "--anno", str(anno_path),
        "--clip_text_ckpt", str(ckpt),
        "--clip_vocab", vf, "--clip_merges", mf,
        "--clip_context", "16", "--clip_text_heads", str(TINY["num_attention_heads"]),
        "--baseline_sim", "cos", "--video_embed_dim", str(E), "--f32",
    ])
    assert set(out) >= {"Recall", "AUC"}

    # library-path oracle: same tokenizer/tower grafted by hand
    mcfg = ModelConfig(num_encoder_layers=0, num_joint_layers=1,
                       video_embed_dim=E, sim="cos",
                       use_alignability_head=False, random_pos_start=False)
    model = RawFeatureBaseline(
        mcfg, vocab_size=tok.vocab_size, use_visual_proj=False,
        text_tower=lambda: CLIPTextEncoder(
            vocab_size=cfg["vocab_size"],
            context_length=cfg["max_position_embeddings"],
            width=cfg["hidden_size"], layers=cfg["num_hidden_layers"],
            heads=cfg["num_attention_heads"], embed_dim=E,
        ),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, E)),
        jnp.zeros((1, 2, 16), jnp.int32),
    )["params"]
    params, _ = neq_merge(
        jax.device_get(params),
        {"lang_model": clip_text_torch_to_params(tm.state_dict())},
    )
    corpus = list(HTMAlignDataset(str(feat_dir), str(anno_path), tok, 16))
    ref = AlignmentEvaluator(
        model, params, EvalConfig(use_alignability_head=False)
    ).evaluate(corpus)
    assert out["Recall"] == pytest.approx(ref["Recall"], abs=1e-9)
    assert out["AUC"] == pytest.approx(ref["AUC"], abs=1e-6)


def test_baseline_clip_mode(rng):
    """RawFeatureBaseline with the CLIP text tower: cosine sims against a
    manual torch computation on converted weights — the reference's CLIP
    baseline path (eval_zeroshot_align.py:294-330)."""
    import jax
    import jax.numpy as jnp
    import torch

    from temporalalignnet_tpu.checkpoint import neq_merge
    from temporalalignnet_tpu.core.config import ModelConfig
    from temporalalignnet_tpu.models import RawFeatureBaseline

    tm, cfg = _tiny_torch_text()
    text_params = clip_text_torch_to_params(tm.state_dict())
    E = cfg["projection_dim"]

    mcfg = ModelConfig(
        num_encoder_layers=0, num_joint_layers=1, video_embed_dim=E,
        sim="cos", use_alignability_head=False, random_pos_start=False,
    )
    model = RawFeatureBaseline(
        mcfg, vocab_size=cfg["vocab_size"], use_visual_proj=False,
        text_tower=lambda: CLIPTextEncoder(
            vocab_size=cfg["vocab_size"],
            context_length=cfg["max_position_embeddings"],
            width=cfg["hidden_size"], layers=cfg["num_hidden_layers"],
            heads=cfg["num_attention_heads"], embed_dim=E,
            eos_token_id=cfg["eos_token_id"],
        ),
    )
    ids = _ids(rng, B=1 * 4, L=12).reshape(1, 4, 12)
    video = rng.randn(1, 6, E).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(video),
        jnp.asarray(ids.astype(np.int32)),
    )["params"]
    params, report = neq_merge(
        jax.device_get(params), {"lang_model": text_params}
    )
    assert not [r for r in report if "missing" in r.lower()], report

    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(ids.astype(np.int32))
    )
    with torch.no_grad():
        t = tm(input_ids=torch.tensor(ids.reshape(-1, 12))).text_embeds.numpy()
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    v = video[0] / np.linalg.norm(video[0], axis=-1, keepdims=True)
    ref = v @ t.T  # [T, N]
    np.testing.assert_allclose(
        np.asarray(out["logits_joint"])[0, 0], ref, atol=2e-5, rtol=1e-4
    )
