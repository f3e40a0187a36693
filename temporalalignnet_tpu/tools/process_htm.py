"""3-step HowTo100M caption pipeline (reference sentencify_text/process_htm.py:71-156).

Step 1: split the giant raw-caption json into N chunks        (:74-94)
Step 2: parallel language+length filtering                    (:96-122)
Step 3: merge linebreaks + sentencify -> per-chunk jsons      (:124-156)

Usage:
  python -m temporalalignnet_tpu.tools.process_htm \\
      --raw_caption raw_caption.json --out_dir out/ \\
      --punct_model_dir bert-restore-punctuation/ [--num_chunks 8] [--jobs 16]

Input format: {vid: {"text": [...], "start": [...], "end": [...]}}.
Without --punct_model_dir only the already-punctuated skip-path is available.
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Optional

from temporalalignnet_tpu.tools.filters import (
    filter_language,
    filter_length,
    merge_linebreaks,
)


def split_chunks(raw_caption_path: str, out_dir: str, num_chunks: int = 8) -> list:
    with open(raw_caption_path) as f:
        raw = json.load(f)
    vids = sorted(raw.keys())
    paths = []
    os.makedirs(out_dir, exist_ok=True)
    per = (len(vids) + num_chunks - 1) // num_chunks
    for i in range(num_chunks):
        part = {v: raw[v] for v in vids[i * per : (i + 1) * per]}
        p = os.path.join(out_dir, f"raw_chunk_{i}.json")
        with open(p, "w") as f:
            json.dump(part, f)
        paths.append(p)
    return paths


def _vid_passes(item) -> bool:
    caps = [str(t) for t in item["text"]]
    return filter_length(caps) and filter_language(caps)


def filter_chunk(chunk_path: str) -> str:
    with open(chunk_path) as f:
        chunk = json.load(f)
    kept = {v: it for v, it in chunk.items() if _vid_passes(it)}
    out = chunk_path.replace("raw_chunk", "filtered_chunk")
    with open(out, "w") as f:
        json.dump(kept, f)
    return out


def filter_chunks(paths, jobs: int = 8) -> list:
    with ProcessPoolExecutor(jobs) as pool:
        return list(pool.map(filter_chunk, paths))


def sentencify_chunk(chunk_path: str, sentencifier) -> str:
    with open(chunk_path) as f:
        chunk = json.load(f)
    out_dict: Dict[str, Dict] = {}
    for vid, item in chunk.items():
        caps, starts, ends = merge_linebreaks(
            item["text"], item["start"], item["end"]
        )
        if not caps:
            continue
        caps, starts, ends = sentencifier.punctuate_and_cut(caps, starts, ends)
        out_dict[vid] = {"text": caps, "start": starts, "end": ends}
    out = chunk_path.replace("filtered_chunk", "sentencified_chunk")
    with open(out, "w") as f:
        json.dump(out_dict, f)
    return out


def main(argv=None):
    p = argparse.ArgumentParser("HTM caption pipeline")
    p.add_argument("--raw_caption", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_chunks", type=int, default=8)
    p.add_argument("--jobs", type=int, default=8)
    p.add_argument("--punct_model_dir", default=None)
    args = p.parse_args(argv)

    chunks = split_chunks(args.raw_caption, args.out_dir, args.num_chunks)
    print(f"step 1: {len(chunks)} chunks")
    filtered = filter_chunks(chunks, args.jobs)
    print("step 2: filtered")

    from temporalalignnet_tpu.tools.sentencify import HFPunctuator, Sentencify

    if args.punct_model_dir:
        sent = Sentencify(HFPunctuator(args.punct_model_dir))
    else:
        # skip-path only: captions must already carry punctuation
        class _NoPunct:
            def tokenize(self, text):
                raise RuntimeError(
                    "--punct_model_dir required for unpunctuated captions"
                )

            convert_tokens_to_ids = predict = tokenize

        sent = Sentencify(_NoPunct())
    outs = [sentencify_chunk(c, sent) for c in filtered]
    print(f"step 3: wrote {outs}")
    return outs


if __name__ == "__main__":
    main()
