"""Miniature full-paper pipeline through the REAL CLI artifacts (VERDICT r4 #4).

The reference recipe (readme.md:20-28 + end2end/readme.md:1-14) is:

  Stage-1 pretrain -> Stage-2 co-train (init from Stage-1) -> run the trained
  TAN over the corpus to emit HTM-AA auto-aligned pairs -> end-to-end S3D
  fine-tune on HTM-AA -> evaluate via linear probe.

Each leg has closed-loop tests elsewhere; THIS test composes them through the
actual checkpoint/csv handoffs (exp-dir params_latest exports, --pretrain
remap, generated htm_aa csv schema) on tiny synthetic data — the seams where
piecewise-green systems break.
"""

import glob
import json
import os

import numpy as np
import pytest

VOCAB = ["cut", "the", "onion", "into", "pieces", "add", "oil", "pan",
         "mix", "well", "bake", "for", "ten", "minutes"]
VDIM, WIDTH, HEADS, ENC, JOINT = 48, 64, 4, 2, 3  # JOINT>=3: head taps layer 2
SEQ, NWORDS = 32, 8


def _build_corpus(tmp_path, rng, n_videos=10):
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    captions = {}
    for i in range(n_videos):
        vid = f"v{i:02d}"
        vlen = int(rng.randint(96, 120))
        np.save(feat_dir / f"{vid}.mp4.npy",
                (rng.randn(vlen, VDIM) * 0.5).astype(np.float16))
        n_caps = 10
        bounds = np.sort(rng.choice(np.arange(2, vlen - 2), n_caps + 1,
                                    replace=False))
        captions[vid] = {
            "text": [" ".join(rng.choice(VOCAB, rng.randint(3, 7)))
                     for _ in range(n_caps)],
            "start": bounds[:-1].astype(float).tolist(),
            "end": bounds[1:].astype(float).tolist(),
        }
    cap_path = tmp_path / "captions.json"
    cap_path.write_text(json.dumps(captions))
    vocab_path = tmp_path / "vocab.npy"
    np.save(vocab_path, np.array(VOCAB))
    return str(feat_dir), str(cap_path), str(vocab_path)


def _exp_dir(prefix):
    dirs = glob.glob(os.path.join(prefix, "*"))
    assert len(dirs) == 1, dirs
    return dirs[0]


def _tan_args(feat_dir, cap_path, vocab_path):
    return [
        "--feature_dir", feat_dir, "--captions", cap_path,
        "--vocab", vocab_path,
        "--width", str(WIDTH), "--heads", str(HEADS),
        "--num_encoder_layers", str(ENC), "--num_joint_layers", str(JOINT),
        "--video_embed_dim", str(VDIM),
        "--seq_len", str(SEQ), "--max_sentences", "6",
        "--max_words", str(NWORDS),
        "--batch_size", "4", "--num_workers", "2",
        "--lr", "1e-3", "--warmup_iterations", "1",
        "--runtime_save_iter", "0", "--log_every", "100",
        "--eval_every_epochs", "100",  # no downstream corpora wired here
        "--epochs", "2", "--max_steps", "3",
        "--seed", "0",
        # the CI host exposes 8 virtual devices; batch 4 shards over dp=2
        "--dp", "2", "--tp", "1",
    ]


@pytest.mark.slow
def test_full_paper_pipeline(tmp_path, rng):
    from temporalalignnet_tpu.checkpoint import diff_param_trees, load_params
    from temporalalignnet_tpu.tools.generate_htm_aa import main as gen_main
    from temporalalignnet_tpu.train.cli import main as train_main
    from temporalalignnet_tpu.train.end2end_cli import main as e2e_main

    feat_dir, cap_path, vocab_path = _build_corpus(tmp_path, rng)
    base = _tan_args(feat_dir, cap_path, vocab_path)

    # ---- Stage 1: init pretrain (reference train/main.py --model init)
    m1 = train_main(base + ["--model", "init", "--prefix",
                            str(tmp_path / "s1")])
    exp1 = _exp_dir(str(tmp_path / "s1"))
    s1 = load_params(os.path.join(exp1, "params_latest"))
    assert np.isfinite(m1.get("loss", m1.get("final_step", 0.0)) or 0.0)

    # ---- Stage 2: cotrain, initialized from Stage-1 via --pretrain
    # (the reference's key-space remap, train/main.py:463-484)
    m2 = train_main(base + [
        "--model", "cotrain", "--loss_threshold", "0.5",
        "--pretrain", exp1, "--prefix", str(tmp_path / "s2"),
    ])
    exp2 = _exp_dir(str(tmp_path / "s2"))
    s2 = load_params(os.path.join(exp2, "params_latest"))
    # handoff contract: stage-2's tree is stage-1's plus ONLY the new
    # alignability head (fresh init kept by the non-strict merge)
    diff = diff_param_trees(s2, s1)
    assert diff and all(d.startswith("missing: aligner/binary_head") for d in diff), diff
    # the cotrain run exports its EMA/target half too (twin export source)
    assert os.path.isdir(os.path.join(exp2, "ema_latest"))

    # ---- HTM-AA generation from the trained Stage-2 model (the system's
    # output product; reference readme.md:20-28)
    aa_csv = str(tmp_path / "htm_aa_v1.csv")
    rows = gen_main([
        "--ckpt", exp2, "--features", feat_dir, "--captions", cap_path,
        "--vocab", vocab_path, "--out", aa_csv,
        "--seq_len", str(SEQ), "--max_words", str(NWORDS),
        "--video_embed_dim", str(VDIM), "--width", str(WIDTH),
        "--heads", str(HEADS),
        "--num_encoder_layers", str(ENC), "--num_joint_layers", str(JOINT),
        "--threshold_quantile", "0.4",
    ])
    assert len(rows) >= 8  # quantile 0.4 over 100 sentences keeps ~60
    n_vids_in_csv = len({r["vid"] for r in rows})
    # the e2e CLI meshes over ALL local devices (8 on the CI host), so its
    # global batch below is 8 — every corpus video must have survived
    assert n_vids_in_csv >= 8
    with open(aa_csv) as f:
        header = f.readline().strip().split(",")
    assert header[:3] == ["vid", "text", "timestamp"]  # HTMClipDataset schema
    for r in rows:  # timestamps are argmaxes over the true video length
        assert 0 <= r["timestamp"] < 120

    # ---- end-to-end S3D fine-tune on the GENERATED csv (synthetic decoder;
    # reference end2end/main_nce.py)
    m3 = e2e_main([
        "--htm_aa_csv", aa_csv, "--video_root", str(tmp_path),
        "--vocab", vocab_path,
        "--decoder", "synthetic", "--check_existence", "0",
        "--num_frames", "4", "--crop_size", "32",
        "--num_sample_per_video", "1", "--num_classes", "16",
        "--max_words", str(NWORDS), "--batch_size", "8",
        "--epochs", "1", "--max_steps", "2",
        "--lr", "1e-3", "--warmup_iterations", "1",
        "--num_workers", "2", "--log_every", "100",
        "--runtime_save_iter", "0", "--seed", "0",
        "--prefix", str(tmp_path / "e2e"),
    ])
    assert np.isfinite(m3["loss"])
    exp3 = _exp_dir(str(tmp_path / "e2e"))
    e2e_params = load_params(os.path.join(exp3, "params_latest"))
    assert set(e2e_params) == {"video", "text"}

    # ---- linear probe on the FINE-TUNED S3D embeddings
    # (end2end/readme.md:11-13 protocol; frozen BN -> init running stats)
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.eval.linear_probe import linear_probe
    from temporalalignnet_tpu.models.s3d import S3D

    s3d = S3D(num_classes=16)
    stats = s3d.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 4, 32, 32, 3), jnp.float32))["batch_stats"]
    variables = {"params": e2e_params["video"], "batch_stats": stats}

    def embed(batch):
        return np.asarray(
            s3d.apply(variables, jnp.asarray(batch), return_embedding=True)
        )

    def clipset(color, n):
        base = np.zeros((n, 4, 32, 32, 3), np.float32)
        base[..., color] = 0.8
        return base + 0.05 * rng.rand(n, 4, 32, 32, 3).astype(np.float32)

    Xtr = np.concatenate([embed(clipset(c, 6)) for c in range(3)])
    ytr = np.repeat(np.arange(3), 6)
    Xte = np.concatenate([embed(clipset(c, 3)) for c in range(3)])
    yte = np.repeat(np.arange(3), 3)
    m = linear_probe(Xtr, ytr, Xte, yte, num_classes=3, steps=200)
    assert m["top1"] >= 0.8, m  # chance = 1/3
