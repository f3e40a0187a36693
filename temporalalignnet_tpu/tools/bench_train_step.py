"""Train-step microbenchmark: fused MIL-NCE Pallas kernel vs the XLA logits path.

Times the full jitted train step (forward + loss + grad + optimizer + EMA) at
flagship scale on the current backend, for Stage-1 ('init') or Stage-2
('cotrain' + agreement + threshold + alignability head), with the loss either
materializing the [B,S,T,B,N] logits (standard) or running the fused
sim+masked-logsumexp kernel (ops/pallas_milnce.py).

  python -m temporalalignnet_tpu.tools.bench_train_step --stage 1 --fused 1

Prints one JSON line.  Timing synchronizes via a scalar device->host fetch of
the final step's loss: the step chain is sequential, so that fetch fences all
queued work (jax.block_until_ready does not block on the axon tunnel).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1, choices=[1, 2])
    p.add_argument("--fused", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--max_sentences", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize encoder blocks in backward "
                        "(activation-memory lever; expect a FLOPs cost)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tan_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
    from temporalalignnet_tpu.data.synthetic import synthetic_batch
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.train.train_step import create_train_state, make_train_step

    fused = bool(args.fused)
    stage2 = args.stage == 2
    loss_cfg = LossConfig(
        use_fused_milnce=fused,
        **(
            dict(
                model="cotrain",
                learn_agreement=True,
                temporal_agreement_type="keep",
                loss_threshold=0.5,
                use_alignability_head=True,
            )
            if stage2
            else {}
        ),
    )
    mcfg = ModelConfig(
        use_alignability_head=loss_cfg.use_alignability_head, fused_milnce=fused
    )
    on_tpu = jax.default_backend() == "tpu"
    model = TANWithText(
        mcfg, vocab_size=66251, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        remat=bool(args.remat),
    )
    tcfg = TrainConfig(lr=1e-4, warmup_iterations=10, total_iterations=10_000)

    rng = np.random.RandomState(0)
    batch = synthetic_batch(
        rng,
        batch_size=args.batch_size,
        seq_len=args.seq_len,
        max_sentences=args.max_sentences,
        feature_dim=mcfg.video_embed_dim,
        vocab_size=66251,
        max_words=32,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, tx = create_train_state(model, tcfg, loss_cfg, batch)
    step = make_train_step(model, tx, tcfg, loss_cfg)

    # compiled-program memory footprint (XLA's own accounting — temp =
    # activations + scratch; best-effort, not all backends report it)
    temp_mb = None
    try:
        ma = step.lower(state, batch).compile().memory_analysis()
        temp_mb = round(ma.temp_size_in_bytes / 2**20, 1)
    except Exception:
        pass

    # compile + warmup; scalar fetch is the only reliable fence on axon
    for _ in range(3):
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])
        dt = time.perf_counter() - t0
        best = max(best, args.iters / dt)

    out = {
        "metric": f"stage{args.stage}_train_steps_per_sec",
        "fused_milnce": fused,
        "remat": bool(args.remat),
        "temp_mb": temp_mb,
        "value": round(best, 2),
        "unit": "steps/s",
        "batch_size": args.batch_size,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
