"""Host data-pipeline throughput bench: can the loader feed the TPU step?

The train-step bench (tools/bench_train_step.py) measures the DEVICE side of
a step on synthetic pre-built batches; this measures the HOST side — the real
``HTMFeatureDataset.sample`` -> ``stack_samples`` -> ``TrainLoader`` path on a
synthetic on-disk corpus at reference scale (vlen ~400 s videos, ~60 captions
each, 512-d features — the htm-370k shape from SURVEY §6).

Prints samples/s and batches/s per worker count, plus the implied core count
needed to feed a given device step rate (e.g. the measured 59.6 stage-1
steps/s at B=64 on v5e).  The reference's equivalent knob is the torch
DataLoader's ``num_workers`` (train/main.py:218-227); here workers are
threads in one process (numpy releases the GIL for the memmap reads and
stacking), so single-host scaling tops out at the core count — multi-process
feeding shards rows per host instead (data/prefetch.py local_rows).

Usage:  python -m temporalalignnet_tpu.tools.bench_loader [--batch_size 64]
        [--workers 1,2,4,8] [--videos 80] [--batches 40] [--target_sps 3814]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from temporalalignnet_tpu.core.config import DataConfig
from temporalalignnet_tpu.data.htm import HTMFeatureDataset
from temporalalignnet_tpu.data.prefetch import TrainLoader
from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

WORDS = [f"word{i}" for i in range(600)]


def build_corpus(
    root: str, n_videos: int, rng: np.random.RandomState
) -> "tuple[str, str]":
    """Reference-scale synthetic corpus: {vid}.mp4.npy + captions json.

    Returns (feature_dir, captions_json_path)."""
    feat_dir = os.path.join(root, "features")
    os.makedirs(feat_dir, exist_ok=True)
    captions = {}
    for i in range(n_videos):
        vid = f"v{i:04d}"
        vlen = int(rng.randint(300, 500))  # ~400 s @ 1 feature/s
        np.save(
            os.path.join(feat_dir, vid + ".mp4.npy"),
            rng.randn(vlen, 512).astype(np.float16),
        )
        n_caps = int(rng.randint(40, 80))
        bounds = np.sort(rng.uniform(2, vlen - 2, n_caps + 1))
        captions[vid] = {
            "text": [
                " ".join(rng.choice(WORDS, rng.randint(4, 14)))
                for _ in range(n_caps)
            ],
            "start": bounds[:-1].tolist(),
            "end": bounds[1:].tolist(),
        }
    cap_path = os.path.join(root, "captions.json")
    with open(cap_path, "w") as f:
        json.dump(captions, f)
    return feat_dir, cap_path


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--videos", type=int, default=80)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--workers", default="1,2,4")
    p.add_argument(
        "--cache_videos", type=int, default=256,
        help="per-video host cache size (0 = reference-style reload/retokenize)",
    )
    p.add_argument(
        "--target_sps", type=float, default=59.6 * 64,
        help="device demand in samples/s to size cores against "
        "(default: measured v5e stage-1 fused, 59.6 steps/s * B=64)",
    )
    args = p.parse_args(argv)

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        feat_dir, cap_path = build_corpus(root, args.videos, rng)
        cfg = DataConfig(batch_size=args.batch_size, feature_dim=512)
        tok = Word2VecTokenizer(WORDS, max_words=cfg.max_words)
        ds = HTMFeatureDataset(
            feat_dir, cap_path, cfg, "train", tok,
            cache_videos=args.cache_videos,
        )
        print(f"corpus: {len(ds)} samples over {args.videos} videos")
        if len(ds) < args.batch_size:
            raise SystemExit(
                f"corpus too small: {len(ds)} samples < batch_size "
                f"{args.batch_size} and drop_last leaves zero batches — "
                "raise --videos or lower --batch_size"
            )

        for w in [int(x) for x in args.workers.split(",")]:
            loader = TrainLoader(
                ds, batch_size=args.batch_size, shuffle=True, seed=0,
                num_workers=w, prefetch=2, drop_last=True,
            )
            # warm one batch (thread pool spin-up, page cache); an epoch is
            # one window per video (reference semantics), so loop epochs
            # until enough batches are timed.  Close the warm-up iterator
            # explicitly so its producer stops before the timed loop starts
            # (otherwise it may race one extra batch on the shared pool).
            it = iter(loader)
            next(it)
            it.close()
            t0 = time.perf_counter()
            n, epoch = 0, 0
            while n < args.batches * args.batch_size:
                loader.set_epoch(epoch)
                for batch in loader:
                    n += batch["video"].shape[0]
                    if n >= args.batches * args.batch_size:
                        break
                epoch += 1
            dt = time.perf_counter() - t0
            sps = n / dt
            print(
                f"workers={w}: {sps:,.0f} samples/s "
                f"({sps / args.batch_size:.1f} batches/s at B={args.batch_size}; "
                f"feeding {args.target_sps:,.0f} samples/s needs "
                f"~{max(1.0, args.target_sps / sps):.1f}x this)"
            )


if __name__ == "__main__":
    main()
