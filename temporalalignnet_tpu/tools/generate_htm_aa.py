"""Generate HTM-AA: auto-aligned (vid, text, timestamp) pairs from a trained TAN.

This is the system's output product — the reference releases HTM-AA as a
dataset (readme.md:20-28, end2end/readme.md:1-14) but its generation script is
the missing ``eval/inference_zeroshot_align.py`` import (SURVEY §2.9#4).  The
procedure follows the paper's description and the eval machinery:

per video:
  1. run the overlap-seq aligner (AlignmentEvaluator.evaluate_video) to get the
     [N, vlen] similarity canvas and per-sentence alignability scores;
  2. keep sentences whose alignability score clears ``threshold`` (quantile
     over the corpus when ``threshold_quantile`` is given);
  3. timestamp = argmax over time of the stitched similarity row.

Output: htm_aa csv (vid, text, timestamp) — exactly what HTMClipDataset /
the end2end fine-tune consume (end2end/video_loader.py:63-64).

  python -m temporalalignnet_tpu.tools.generate_htm_aa \\
      --ckpt cotrain_...pth.tar --features <dir> --captions sentencified.json \\
      --vocab s3d_dict.npy --out htm_aa_v1.csv
"""

from __future__ import annotations

import argparse
import csv
import json
from typing import Dict, List, Optional, Sequence

import numpy as np

MASK_VALUE = -6.0e4


def align_corpus(
    evaluator,
    items: Sequence[Dict],
    threshold: Optional[float] = None,
    threshold_quantile: Optional[float] = 0.5,
) -> List[Dict]:
    """items: AlignmentEvaluator corpus entries (sentences need 'text').
    Returns [{vid, text, timestamp, score}, ...] for confident sentences."""
    per_video = []
    all_scores = []
    for item in items:
        res = evaluator.evaluate_video(item)
        per_video.append(res)
        all_scores.append(res["align_score"])
    flat = np.concatenate(all_scores) if all_scores else np.zeros(0)
    if threshold is None:
        threshold = float(np.quantile(flat, threshold_quantile)) if flat.size else 0.0

    rows = []
    for item, res in zip(items, per_video):
        sim = res["sim"]  # [N, vlen]
        masked = np.where(sim == 0, MASK_VALUE, sim)
        for i, sent in enumerate(item["sentences"]):
            score = float(res["align_score"][i])
            if score < threshold:
                continue
            rows.append(
                {
                    "vid": item["vid"],
                    "text": sent.get("text", ""),
                    "timestamp": float(np.argmax(masked[i])),
                    "score": score,
                }
            )
    return rows


def write_htm_aa_csv(rows: Sequence[Dict], path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["vid", "text", "timestamp", "score"])
        w.writeheader()
        for r in rows:
            w.writerow(r)


def captions_to_corpus(captions: Dict, feature_dir: str, tokenizer, max_words: int):
    """Unlabeled caption records -> evaluator corpus items (alignability
    unknown -> 0 so active-window selection uses every sentence's ASR time)."""
    from temporalalignnet_tpu.data.htm import load_feature
    from temporalalignnet_tpu.data.padding import pad_tokens

    for vid, rec in captions.items():
        try:
            video = load_feature(feature_dir, vid).astype(np.float32)
        except FileNotFoundError:
            continue
        sentences = []
        for text, s, e in zip(rec["text"], rec["start"], rec["end"]):
            ids = np.asarray(tokenizer(str(text))["input_ids"], np.int32).reshape(-1)
            sentences.append(
                {
                    "aligned": 0,  # unknown; ASR times drive the active windows
                    "start": float(s),
                    "end": float(e),
                    "text": str(text),
                    "input_ids": pad_tokens(ids, max_words),
                }
            )
        if sentences:
            yield {"vid": vid, "video": video, "sentences": sentences}


def main(argv=None):
    p = argparse.ArgumentParser("generate HTM-AA from a trained TAN")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--captions", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--video_embed_dim", type=int, default=1024)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--num_joint_layers", type=int, default=6)
    p.add_argument("--use_alignability_head", type=int, default=1)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--threshold_quantile", type=float, default=0.5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.core.config import EvalConfig, ModelConfig
    from temporalalignnet_tpu.eval.align import AlignmentEvaluator
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

    tokenizer = Word2VecTokenizer(args.vocab, max_words=args.max_words)
    mcfg = ModelConfig(
        width=args.width,
        heads=args.heads,
        num_encoder_layers=args.num_encoder_layers,
        num_joint_layers=args.num_joint_layers,
        video_embed_dim=args.video_embed_dim,
        use_alignability_head=bool(args.use_alignability_head),
        random_pos_start=False,
    )
    model = TANWithText(
        mcfg, vocab_size=tokenizer.vocab_size,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
    )
    if args.ckpt.endswith((".pth.tar", ".pth", ".tar")):
        from temporalalignnet_tpu.checkpoint import load_reference_checkpoint

        params = load_reference_checkpoint(args.ckpt)["params"]
    else:
        import os

        from temporalalignnet_tpu.checkpoint import load_params

        ckpt = args.ckpt
        if os.path.isdir(os.path.join(ckpt, "params_latest")):
            ckpt = os.path.join(ckpt, "params_latest")  # experiment dir
        params = load_params(ckpt)

    from temporalalignnet_tpu.data.htm import load_captions

    captions = load_captions(args.captions)  # json, .jsonl store, or dict
    corpus = list(
        captions_to_corpus(captions, args.features, tokenizer, args.max_words)
    )
    ev = AlignmentEvaluator(
        model, params,
        EvalConfig(seq_len=args.seq_len,
                   use_alignability_head=mcfg.use_alignability_head),
    )
    rows = align_corpus(ev, corpus, args.threshold, args.threshold_quantile)
    write_htm_aa_csv(rows, args.out)
    print(json.dumps({"videos": len(corpus), "pairs": len(rows), "out": args.out}))
    return rows


if __name__ == "__main__":
    main()
