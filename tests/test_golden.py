"""Golden end-to-end test: the full pipeline learns planted alignments.

The reference's only regression anchors are baseline harnesses with expected
numbers in comments (SURVEY §4.2).  This is the equivalent for the rebuilt
framework: fixed seeds, synthetic features with planted video<->text
correlation, the real loader -> train step -> evaluator path, and a required
metric floor.  The numbers are stable because every RNG is seeded.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import (
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from temporalalignnet_tpu.data import HTMAlignDataset, HTMFeatureDataset, TrainLoader
from temporalalignnet_tpu.eval.align import AlignmentEvaluator
from temporalalignnet_tpu.models.net import TANWithText
from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer
from temporalalignnet_tpu.train.train_step import create_train_state, make_train_step

VOCAB = ["cut", "the", "onion", "into", "small", "pieces", "add", "oil", "pan",
         "mix", "well", "bake", "for", "ten", "minutes", "heat", "water", "salt",
         "pepper", "stir", "slice", "bread", "cheese", "egg", "fry"]
CDIM = 32


def build_fixtures(root, rng):
    proj = np.random.RandomState(7).randn(len(VOCAB) + 1, CDIM).astype(np.float32)

    def planted(vlen, sents):
        v = rng.randn(vlen, CDIM).astype(np.float32)
        for s in sents:
            if not s["aligned"]:
                continue
            ids = [VOCAB.index(w) + 1 for w in s["text"].split() if w in VOCAB]
            d = proj[ids].mean(0)
            d /= np.linalg.norm(d) + 1e-6
            v[int(s["start"]):int(s["end"])] += 2.0 * d * np.sqrt(CDIM)
        return v

    feat = root / "features"
    feat.mkdir()
    captions = {}
    for i in range(10):
        vid = f"train{i:02d}"
        vlen = 120 + 8 * i
        bounds = np.sort(rng.choice(np.arange(3, vlen - 3), 11, replace=False))
        sents = [
            {"text": " ".join(rng.choice(VOCAB, rng.randint(3, 6))),
             "start": float(bounds[j]), "end": float(bounds[j + 1]), "aligned": 1}
            for j in range(10)
        ]
        np.save(feat / f"{vid}.mp4.npy", planted(vlen, sents))
        captions[vid] = {
            "text": [s["text"] for s in sents],
            "start": [s["start"] for s in sents],
            "end": [s["end"] for s in sents],
        }
    (root / "captions.json").write_text(json.dumps(captions))

    afeat = root / "align_features"
    afeat.mkdir()
    anno = {}
    for i in range(3):
        vid = f"alignv{i}"
        vlen = 100 + 10 * i
        sents = [
            {"text": " ".join(rng.choice(VOCAB, 4)),
             "start": float(5 + j * 15), "end": float(15 + j * 15),
             "aligned": int(j % 2 == 0)}
            for j in range(6)
        ]
        np.save(afeat / f"{vid}.npy", planted(vlen, sents))
        anno[vid] = [[s["aligned"], s["start"], s["end"], s["text"]] for s in sents]
    (root / "htm_align.json").write_text(json.dumps(anno))
    return str(feat), str(root / "captions.json"), str(afeat), str(root / "htm_align.json")


@pytest.mark.slow
def test_pipeline_learns_planted_alignment(tmp_path):
    rng = np.random.RandomState(42)
    feat_dir, captions, align_feat, align_anno = build_fixtures(tmp_path, rng)

    tok = Word2VecTokenizer(VOCAB, max_words=8)
    dcfg = DataConfig(seq_len=32, max_sentences=8, max_words=8, batch_size=8,
                      feature_dim=CDIM)
    dataset = HTMFeatureDataset(feat_dir, captions, dcfg, "train", tok)
    loader = TrainLoader(dataset, 8, seed=0, num_workers=2)

    mcfg = ModelConfig(width=64, heads=4, num_encoder_layers=2,
                       num_joint_layers=2, video_embed_dim=CDIM,
                       num_pos_embeds=128)
    model = TANWithText(mcfg, vocab_size=tok.vocab_size)
    batch0 = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    tcfg = TrainConfig(lr=1e-3, warmup_iterations=2, total_iterations=50)
    state, tx = create_train_state(model, tcfg, LossConfig(), batch0, seed=0)
    step = make_train_step(model, tx, tcfg, LossConfig())

    corpus = list(HTMAlignDataset(align_feat, align_anno, tok, max_words=8))
    ev = AlignmentEvaluator(model, state.params,
                            EvalConfig(seq_len=32, batch_windows=8))
    before = ev.evaluate(corpus)

    losses = []
    for epoch in range(8):
        loader.set_epoch(epoch)
        for batch in loader:
            state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
            losses.append(float(metrics["loss"]))

    ev.params = state.params
    after = ev.evaluate(corpus)

    assert losses[-1] < losses[0] * 0.7, losses
    # planted correlation is strong; brief training should align most sentences
    # (AUC is too noisy on an 18-sentence corpus to pin — Recall is the anchor)
    assert after["Recall"] >= 0.5, (before, after)
    assert after["Recall"] > before["Recall"] + 0.2, (before, after)
