"""Benchmark: len-64 video-text eval windows/sec/chip (BASELINE.json north-star).

Workload = the fused zero-shot eval forward on the flagship E6D6 model: word2vec
text encoding + dual encoder + joint [video || text] encoder + per-layer cosine
sims + alignability head, on a batch of [T=64, C=1024] feature windows with 8
sentences each — exactly the per-window work of the reference's HTM-Align
overlap-seq eval (reference eval/eval_zeroshot_align.py:127-205, which runs it as
a batch-size-1 Python loop).

vs_baseline = speedup over the same workload in PyTorch on CPU (the reference is
torch; no GPU in this image).  The torch baseline is measured once and cached in
BASELINE_MEASURED.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# windows per jit call.  Swept on v5e (see IMPLEMENTATION_STATUS.md): 13.6k w/s
# at 192 vs 12.9k at 256; above ~384 XLA stops fusing the joint-encoder
# attention probabilities ([B,H,72,72] fp32 > ~50 MB) and throughput drops to
# 10.3k at 512 (the Pallas attention kernel restores 13.1k there — use it for
# window batches >= 512).
B = int(os.environ.get("TAN_BENCH_B", "192"))
T = 64
CV = 1024
N = 8  # sentences per window
W = 32  # words per sentence
ITERS = 10
# Batches per dispatch in the default scan mode.  The axon tunnel costs ~3 ms of
# serial dispatch per jit call (profiles/eval_fwd_b192_v5e.md: 11.1 ms device
# busy vs 14.0 ms wall) that host-side call pipelining does NOT hide; driving K
# batches through one lax.scan dispatch amortizes it away: measured on v5e
# 13.6k w/s per-call -> 16.0k at K=40 -> 16.6k at K=80 -> 16.6k at K=120
# (~96% of the 17.3k device-busy roofline; K=120 needs ~6 GB for the stacked
# inputs, comfortably inside one v5e).  TAN_BENCH_MODE=percall restores the
# per-call timing.
K = int(os.environ.get("TAN_BENCH_K", "120"))
MODE = os.environ.get("TAN_BENCH_MODE", "scan")
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    # Compiles travel over the axon tunnel and are slow/variable; cache them.
    jax.config.update("jax_compilation_cache_dir", "/tmp/tan_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from temporalalignnet_tpu.core.config import ModelConfig
    from temporalalignnet_tpu.models.net import TANWithText

    cfg = ModelConfig(use_alignability_head=True)
    on_tpu = jax.default_backend() == "tpu"
    # auto kernel policy (measured, IMPLEMENTATION_STATUS.md): XLA fuses the
    # joint-encoder attention probs in VMEM up to ~B=384 window batches; at
    # >= 512 they spill to HBM and the Pallas attention kernel wins (10.3k ->
    # 13.1k w/s at B=512).  TAN_BENCH_PALLAS=0/1 overrides.
    use_pallas = bool(int(
        os.environ.get("TAN_BENCH_PALLAS", str(int(on_tpu and B >= 512)))
    ))
    model = TANWithText(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(B, T, CV), jnp.float32)
    input_ids = jnp.asarray(rng.randint(1, 60000, (B, N, W)), jnp.int32)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        video[:2],
        input_ids[:2],
        deterministic=True,
    )["params"]

    def one(params, video, input_ids):
        attention_mask = (input_ids != 0).astype(jnp.int32)
        text = model.apply(
            {"params": params}, input_ids, attention_mask, method=TANWithText.encode_text
        )
        return model.apply(
            {"params": params}, video, text, method=TANWithText.text_visual_sims
        )

    # Synchronize via a host fetch: on the tunneled 'axon' platform
    # block_until_ready returns before the device work drains, so a device->host
    # copy of (part of) the result is the only reliable fence.
    def sync(o):
        np.asarray(o["sim"].ravel()[:1])

    if MODE == "scan":
        # K distinct batches through one dispatch: lax.scan over stacked inputs.
        video_k = jnp.asarray(rng.randn(K, B, T, CV), jnp.float32)
        ids_k = jnp.asarray(rng.randint(1, 60000, (K, B, N, W)), jnp.int32)

        @jax.jit
        def fwd_scan(params, video, input_ids):
            def body(carry, xs):
                v, ids = xs
                return carry, one(params, v, ids)

            _, outs = jax.lax.scan(body, 0, (video, input_ids))
            return outs

        out = fwd_scan(params, video_k, ids_k)  # compile + warmup
        sync(out)
        out = fwd_scan(params, video_k, ids_k)
        sync(out)

        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = fwd_scan(params, video_k, ids_k)
            sync(out)
            dt = time.perf_counter() - t0
            best = max(best, K * B / dt)
        return best

    fwd = jax.jit(one)

    out = fwd(params, video, input_ids)  # compile + warmup
    sync(out)
    out = fwd(params, video, input_ids)
    sync(out)

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(params, video, input_ids)
        sync(out)
        dt = time.perf_counter() - t0
        best = max(best, B * ITERS / dt)
    return best


def bench_torch_cpu() -> float:
    """Reference-equivalent workload in PyTorch on CPU (same arch, same shapes)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    width, heads, layers = 512, 8, 6

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential(
                nn.Linear(width, 4 * width), nn.GELU(), nn.Linear(4 * width, width)
            )

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.mlp(self.ln2(x))

    class RefEval(nn.Module):
        def __init__(self):
            super().__init__()
            self.word_embd = nn.Embedding(66251, 300)
            self.fc1 = nn.Linear(300, 2048)
            self.fc2 = nn.Linear(2048, width)
            self.vproj = nn.Linear(CV, width, bias=False)
            self.tproj = nn.Linear(width, width, bias=False)
            self.dual = nn.ModuleList(Block() for _ in range(layers))
            self.joint = nn.ModuleList(Block() for _ in range(layers))
            self.head = nn.Linear(width, 1)

        def forward(self, video, ids):
            b, n, w = ids.shape
            t = torch.relu(self.fc1(self.word_embd(ids.reshape(-1, w))))
            t = self.fc2(t.max(dim=1).values).reshape(b, n, width)
            t = self.tproj(t)
            v = self.vproj(video)
            d = v
            for blk in self.dual:
                d = blk(d)
            j = torch.cat([v, t], dim=1)
            for blk in self.joint:
                j = blk(j)
            jv, jt = j[:, :T], j[:, T:]
            nrm = lambda x: x / x.norm(dim=-1, keepdim=True)
            dual_sim = torch.einsum("btc,bkc->btk", nrm(d), nrm(t))
            joint_sim = torch.einsum("btc,bkc->btk", nrm(jv), nrm(jt))
            return dual_sim, joint_sim, self.head(jt)

    model = RefEval().eval()
    bb, iters = 16, 3
    video = torch.randn(bb, T, CV)
    ids = torch.randint(1, 60000, (bb, N, W))
    with torch.no_grad():
        model(video, ids)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(video, ids)
        dt = time.perf_counter() - t0
    return bb * iters / dt


def main():
    wps = bench_jax()

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["torch_cpu_windows_per_sec"]
    else:
        baseline = bench_torch_cpu()
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "torch_cpu_windows_per_sec": baseline,
                    "note": "reference-equivalent E6D6 eval forward, torch CPU, "
                    f"B={B} T={T} N={N}",
                },
                f,
                indent=2,
            )

    print(
        json.dumps(
            {
                "metric": "len64_eval_windows_per_sec_per_chip",
                "value": round(wps, 2),
                "unit": "windows/s/chip",
                "vs_baseline": round(wps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
