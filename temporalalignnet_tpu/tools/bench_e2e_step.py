"""End-to-end S3D fine-tune step bench — the reference's heaviest compute path.

Times the full jitted e2e step (S3D fwd over decoded clips + word2vec text +
symmetric InfoNCE + grad + AdamW) at the reference recipe — 16 frames @ 224²,
2 clips/video (reference end2end/main_nce.py:60-101, num_sample_per_video=2;
S3D at model/s3d_milnce/s3dg.py:321-348) — on synthetic in-memory clips, so
the number is the DEVICE half of the pipeline (decode/host feed is
end2end/video_loader.py territory, benched by tools/bench_loader.py).

  python -m temporalalignnet_tpu.tools.bench_e2e_step --batch_size 8
  python -m temporalalignnet_tpu.tools.bench_e2e_step --train_bn_stats 1
  python -m temporalalignnet_tpu.tools.bench_e2e_step --freeze_early 1 --f32

Prints one JSON line: clips/s (= batch_size * clips_per_video * steps/s),
plus XLA's compiled memory accounting.  Timing synchronizes via a scalar
device->host fetch (jax.block_until_ready does not block on the axon tunnel).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8,
                   help="videos per step (reference --batch_size; clips per "
                        "step = batch_size * clips_per_video)")
    p.add_argument("--clips_per_video", type=int, default=2,
                   help="num_sample_per_video (main_nce.py recipe: 2)")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--train_bn_stats", type=int, default=0,
                   help="1 = BN in train mode with running-stat updates "
                        "(reference WITHOUT freeze_bn surgery)")
    p.add_argument("--freeze_early", type=int, default=0,
                   help="1 = stop gradients into the early S3D blocks")
    p.add_argument("--f32", action="store_true",
                   help="float32 compute (default bf16 on TPU)")
    p.add_argument("--fold_s2d", type=int, default=1,
                   help="0 = explicit space_to_depth transpose before conv1")
    p.add_argument("--num_classes", type=int, default=512)
    p.add_argument("--max_words", type=int, default=16)
    p.add_argument("--vocab_size", type=int, default=66251)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler device trace of 10 "
                        "steady-state steps after timing")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tan_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from temporalalignnet_tpu.core.config import TrainConfig
    from temporalalignnet_tpu.train.end2end import (
        E2ETrainState,
        S3DWithText,
        make_e2e_optimizer,
        make_e2e_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if (args.f32 or not on_tpu) else jnp.bfloat16
    model = S3DWithText(
        num_classes=args.num_classes,
        vocab_size=args.vocab_size,
        freeze_early=bool(args.freeze_early),
        train_bn_stats=bool(args.train_bn_stats),
        dtype=dtype,
        fold_s2d=bool(args.fold_s2d),
    )

    rng = np.random.RandomState(0)
    B, n, T, S = args.batch_size, args.clips_per_video, args.num_frames, args.crop_size
    batch = {
        "clips": jnp.asarray(
            rng.rand(B, n, T, S, S, 3).astype(np.float32), dtype
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, args.vocab_size, (B, n, args.max_words)), jnp.int32
        ),
    }

    variables = model.init(
        jax.random.PRNGKey(0), batch["clips"][0], batch["input_ids"][0]
    )
    tcfg = TrainConfig(lr=1e-5, wd=1e-5, warmup_iterations=10,
                       total_iterations=10_000)
    tx = make_e2e_optimizer(tcfg, variables["params"])
    state = E2ETrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    step = make_e2e_train_step(model, tx, temperature=0.07)

    temp_mb = hbm_mb = gflops = None
    try:
        compiled = step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        temp_mb = round(ma.temp_size_in_bytes / 2**20, 1)
        hbm_mb = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes) / 2**20, 1)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and ca.get("flops"):
            gflops = round(float(ca["flops"]) / 1e9, 1)
    except Exception:
        pass

    for _ in range(3):  # compile + warmup
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])  # the only reliable fence on axon
        dt = time.perf_counter() - t0
        best = max(best, args.iters / dt)

    if args.profile_dir:  # device trace of 10 steady-state steps
        jax.profiler.start_trace(args.profile_dir)
        for _ in range(10):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])
        jax.profiler.stop_trace()

    out = {
        "metric": "e2e_s3d_clips_per_sec",
        "value": round(best * B * n, 2),
        "unit": "clips/s",
        "steps_per_sec": round(best, 3),
        "batch_size": B,
        "clips_per_video": n,
        "num_frames": T,
        "crop_size": S,
        "train_bn_stats": bool(args.train_bn_stats),
        "freeze_early": bool(args.freeze_early),
        "fold_s2d": bool(args.fold_s2d),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "temp_mb": temp_mb,
        "hbm_mb": hbm_mb,
        "gflops_per_step": gflops,
        "achieved_tflops": (
            round(best * gflops / 1e3, 1) if gflops else None
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
