"""Full-scale converter dress rehearsal (VERDICT r1, missing item #1).

The released checkpoint ``cotrain_word2vec_htm-370k_len64_e6d6.pth.tar``
(reference readme.md:45) cannot be downloaded here, so this rehearses the exact
pipeline it will travel at the REAL architecture scale — width 512, 8 heads,
E6D6, vocab 66,250(+1) x 300, 1024-slot pos tables, binary head:

    disk .pth.tar -> torch.load -> converter -> eval CLI -> metrics

and asserts the metrics equal an independent torch-side overlap-seq evaluation
of the same replica (reference eval/eval_zeroshot_align.py:127-250 semantics),
at f32.  Also rehearses the twin (online.*/target.*) Stage-2 key space
(reference train/main.py:463-484).
"""

import json
import math

import numpy as np
import pytest
import torch

from torch_replica import TorchTAN

from temporalalignnet_tpu.eval.metrics import roc_auc_score

FULL = dict(
    width=512, heads=8, enc_layers=6, joint_layers=6,
    vdim=1024, vocab_words=66250, num_pos=1024,
)
SEQ_LEN = 64
HEAD_LAYER = 2  # "3rd layer works the best" (eval_zeroshot_align.py:186)


def _write_corpus(tmp_path, rng, num_videos=2, words=None, vdim=None):
    """Synthetic HTM-Align-format corpus + vocab on disk."""
    if words is None:
        words = np.array([f"w{i}" for i in range(FULL["vocab_words"])])
    if vdim is None:
        vdim = FULL["vdim"]
    vocab_path = tmp_path / "s3d_dict.npy"
    np.save(vocab_path, words)
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    anno = {}
    for v in range(num_videos):
        vlen = int(rng.randint(96, 120))  # one Vb bucket -> one jit shape
        vid = f"dress{v:02d}"
        np.save(feat_dir / f"{vid}.npy", (rng.randn(vlen, vdim) * 0.5).astype(np.float32))
        sents, t = [], 2.0
        while t < vlen - 10 and len(sents) < 10:
            start = t
            end = min(t + float(rng.randint(4, 12)), vlen - 1.0)
            text = " ".join(
                words[rng.randint(0, len(words), size=rng.randint(3, 8))]
            )
            sents.append([int(rng.rand() < 0.5), float(start), float(end), text])
            t = end + float(rng.randint(1, 6))
        # the corpus-level AUC needs both classes present
        sents[0][0], sents[-1][0] = 1, 0
        anno[vid] = sents
    anno_path = tmp_path / "htm_align.json"
    anno_path.write_text(json.dumps(anno))
    return str(feat_dir), str(anno_path), str(vocab_path)


def _torch_overlap_seq_eval(tmodel, corpus, seq_len=SEQ_LEN):
    """Independent torch-side overlap-seq eval of the replica — the reference
    loop semantics (eval_zeroshot_align.py:127-205 canvases, :218-250 metrics),
    variable shapes, exact active subsets.  Also returns per-video canvases."""
    recall, scores, tgts, canvases = [], [], [], []
    for item in corpus:
        video = np.asarray(item["video"], np.float32)
        vlen = video.shape[0]
        sents = item["sentences"]
        n = len(sents)
        aligned = np.array([s["aligned"] for s in sents], bool)
        mids = np.array([(s["start"] + s["end"]) / 2 for s in sents])
        ids_all = np.stack([s["input_ids"] for s in sents])

        logits = np.zeros((n, vlen))
        logits_d = np.zeros((n, vlen))
        cnt = np.zeros((n, vlen))
        aj = np.zeros(n)
        tcnt = np.zeros(n)
        steps = np.arange(0, vlen - seq_len // 2, seq_len // 4)
        for idx, step in enumerate(steps):
            # active set from NON-alignable ASR midpoints (:149-167)
            na = np.nonzero(~aligned)[0]
            in_win = (step - seq_len <= mids[na]) & (mids[na] <= step + 2 * seq_len)
            act = na[in_win]
            if len(act) == 0:
                continue
            left, right = int(act.min()), int(act.max())
            if idx <= 3:
                left = 0
            elif idx >= len(steps) - 4:
                right = n - 1  # the reference clamps via slicing (:166)
            m = np.zeros(n, bool)
            m[left : right + 1] = True

            ids = ids_all[m]
            tok = (ids != 0).astype(np.int64)
            lang_pad = ~tok.astype(bool).any(-1)
            valid = min(vlen, step + seq_len) - step
            with torch.no_grad():
                d, j, h = tmodel(
                    torch.from_numpy(video[None, step : step + valid]),
                    torch.from_numpy(ids)[None],
                    torch.from_numpy(tok)[None],
                    torch.from_numpy(lang_pad)[None],
                )
            logits[m, step : step + valid] += j[0, -1, :, 0, :].numpy().T / 0.07
            logits_d[m, step : step + valid] += d[0, -1, :, 0, :].numpy().T / 0.07
            cnt[m, step : step + valid] += 1.0
            aj[m] += h[0, HEAD_LAYER, :, 0].numpy()
            tcnt[m] += 1.0

        eps = 1e-5
        sim = (logits / np.maximum(cnt, eps) + logits_d / np.maximum(cnt, eps)) / 2
        align = aj / np.maximum(tcnt, eps)
        canvases.append({"sim": sim, "align_score": align})
        scores.append(align)
        tgts.append(aligned.astype(int))
        masked = np.where(sim == 0, -6.0e4, sim)
        for i in np.nonzero(aligned)[0]:
            s = math.floor(sents[i]["start"])
            e = math.ceil(sents[i]["end"])
            recall.append(s <= int(masked[i].argmax()) <= e)
    metrics = {
        "Recall": float(np.mean(recall)),
        "AUC": roc_auc_score(np.concatenate(tgts), np.concatenate(scores)),
    }
    return metrics, canvases


@pytest.mark.slow
def test_full_scale_dress_rehearsal(tmp_path, rng):
    import jax

    from temporalalignnet_tpu.checkpoint import (
        diff_param_trees,
        load_reference_checkpoint,
    )
    from temporalalignnet_tpu.core.config import EvalConfig, ModelConfig
    from temporalalignnet_tpu.data import HTMAlignDataset
    from temporalalignnet_tpu.eval.align import AlignmentEvaluator
    from temporalalignnet_tpu.eval.cli import main as eval_cli_main
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

    torch.manual_seed(7)
    tmodel = TorchTAN(**FULL).eval()
    # a genuine reference-shaped checkpoint dict (train/main.py:146-151)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-4, weight_decay=1e-5)
    ckpt_path = tmp_path / "cotrain_word2vec_full_len64_e6d6.pth.tar"
    torch.save(
        {
            "epoch": 3,
            "state_dict": tmodel.state_dict(),
            "best_acc": 0.421,
            "optimizer": opt.state_dict(),
            "iteration": 4242,
        },
        ckpt_path,
    )

    feat_dir, anno_path, vocab_path = _write_corpus(tmp_path, rng)

    # --- the full pipeline under test: disk -> CLI -> metrics
    out = eval_cli_main(
        [
            "--task", "align",
            "--ckpt", str(ckpt_path),
            "--features", feat_dir,
            "--anno", anno_path,
            "--vocab", vocab_path,
            "--f32",
        ]
    )

    # --- independent torch-side eval of the same corpus
    tok = Word2VecTokenizer(vocab_path)
    corpus = list(HTMAlignDataset(feat_dir, anno_path, tok))
    oracle, oracle_canvases = _torch_overlap_seq_eval(tmodel, corpus)
    assert out["Recall"] == pytest.approx(oracle["Recall"], abs=1e-9)
    assert out["AUC"] == pytest.approx(oracle["AUC"], abs=1e-4)

    # --- converted tree is structurally identical to a fresh full-scale init
    loaded = load_reference_checkpoint(str(ckpt_path), verbose=False)
    assert loaded["epoch"] == 3 and loaded["iteration"] == 4242
    mcfg = ModelConfig(use_alignability_head=True, random_pos_start=False)
    model = TANWithText(mcfg, vocab_size=tok.vocab_size)
    import jax.numpy as jnp

    init = model.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, mcfg.video_embed_dim)),
        jnp.zeros((1, 2, 32), jnp.int32),
        deterministic=True,
    )["params"]
    assert diff_param_trees(init, loaded["params"]) == []

    # --- canvas-level parity on video 0 (tighter than the discrete metrics)
    ev = AlignmentEvaluator(
        model, loaded["params"], EvalConfig(use_alignability_head=True)
    )
    res = ev.evaluate_video(corpus[0])
    np.testing.assert_allclose(
        res["sim"], oracle_canvases[0]["sim"], atol=5e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        res["align_score"], oracle_canvases[0]["align_score"], atol=5e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_bert_tan_dress_rehearsal(tmp_path, rng):
    """language_model='bert' variant (reference tan_model.py:37-40): a genuine
    BERT-TAN ``.pth.tar`` — a real HF BertModel under the ``bert.*`` key space,
    TAN at the full E6D6 scale with the reference's 768-d text dim — through

        disk .pth.tar -> converter -> eval CLI -> metrics

    asserted against an independent torch-side overlap-seq eval: the BERT
    analogue of test_full_scale_dress_rehearsal (VERDICT r3 #6).  BERT depth
    is reduced to 2 layers for CI time; the converter's per-layer mapping is
    structural, so 2 layers exercise it fully (activation parity for the
    encoder itself: test_bert_train.py::test_bert_checkpoint_conversion_parity)."""
    from transformers import BertConfig, BertModel, BertTokenizer

    from temporalalignnet_tpu.data import HTMAlignDataset
    from temporalalignnet_tpu.eval.cli import main as eval_cli_main

    words = [f"w{i}" for i in range(2000)]
    bert_dir = tmp_path / "bert_dir"
    bert_dir.mkdir()
    bcfg = BertConfig(
        vocab_size=4 + len(words), hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bcfg.to_json_file(str(bert_dir / "config.json"))
    (bert_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + words) + "\n"
    )

    torch.manual_seed(3)
    tmodel = TorchTAN(
        width=512, heads=8, enc_layers=6, joint_layers=6, vdim=1024,
        num_pos=1024, text_dim=768, text_encoder=BertModel(bcfg),
    ).eval()
    ckpt_path = tmp_path / "cotrain_bert_htm-370k_len64_e6d6.pth.tar"
    torch.save(
        {"epoch": 2, "state_dict": tmodel.state_dict(), "iteration": 99},
        ckpt_path,
    )

    feat_dir, anno_path, _ = _write_corpus(tmp_path, rng, words=np.array(words))

    out = eval_cli_main(
        [
            "--task", "align",
            "--ckpt", str(ckpt_path),
            "--features", feat_dir,
            "--anno", anno_path,
            "--language_model", "bert",
            "--bert_dir", str(bert_dir),
            "--f32",
        ]
    )

    tok = BertTokenizer.from_pretrained(str(bert_dir))
    corpus = list(HTMAlignDataset(feat_dir, anno_path, tok, 32))
    oracle, _ = _torch_overlap_seq_eval(tmodel, corpus)
    assert out["Recall"] == pytest.approx(oracle["Recall"], abs=1e-9)
    assert out["AUC"] == pytest.approx(oracle["AUC"], abs=1e-4)


@pytest.mark.slow
def test_full_scale_twin_checkpoint(tmp_path):
    """Stage-2 twin key space at full scale: online.* -> params,
    target.* -> ema_params (reference tan_model.py:315-351)."""
    from temporalalignnet_tpu.checkpoint import load_reference_checkpoint

    torch.manual_seed(11)
    tmodel = TorchTAN(**FULL).eval()
    sd = tmodel.state_dict()
    twin = {f"online.{k}": v for k, v in sd.items()}
    twin.update({f"target.{k}": v + 1e-3 for k, v in sd.items()})
    path = tmp_path / "twin_full_e6d6.pth.tar"
    torch.save({"epoch": 1, "state_dict": twin, "iteration": 10}, path)

    loaded = load_reference_checkpoint(str(path), verbose=False)
    assert loaded["ema_params"] is not None
    on = loaded["params"]["aligner"]["binary_head"]["bias"]
    em = loaded["ema_params"]["aligner"]["binary_head"]["bias"]
    np.testing.assert_allclose(
        np.asarray(em), np.asarray(on) + 1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(on), sd["binary_head.bias"].numpy(), atol=0
    )
