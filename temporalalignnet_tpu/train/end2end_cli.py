"""End-to-end S3D fine-tune CLI — the ``end2end/main_nce.py`` equivalent.

  python -m temporalalignnet_tpu.train.end2end_cli \\
      --htm_aa_csv htm_aa_v1.csv --video_root /data/videos \\
      --vocab s3d_dict.npy --pretrain s3d_howto100m.pth ...

DDP/SLURM launch plumbing (main_nce.py:140-158) is replaced by the mesh: run
one process, shard the clip batch over the 'data' axis.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("temporalalignnet_tpu end2end S3D fine-tune")
    p.add_argument("--htm_aa_csv", required=True)
    p.add_argument("--video_root", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--pretrain", default=None, help="MIL-NCE s3d .pth checkpoint")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--fps", type=int, default=5)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--num_sample_per_video", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--warmup_iterations", type=int, default=200)
    p.add_argument("--backprop_freq", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.07)
    p.add_argument("--freeze_early", type=int, default=0)
    p.add_argument("--train_bn_stats", type=int, default=0,
                   help="1 = BN in train mode (no FrozenBN surgery); default "
                        "matches the reference recipe of frozen running stats")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--prefix", default="exp_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=5)
    p.add_argument("--runtime_save_iter", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--max_words", type=int, default=32)
    return p


def main(argv: Optional[list] = None) -> dict:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.checkpoint import Checkpointer, load_milnce_checkpoint
    from temporalalignnet_tpu.core.config import TrainConfig
    from temporalalignnet_tpu.data.clips import HTMClipDataset
    from temporalalignnet_tpu.data.prefetch import TrainLoader, make_device_put
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer
    from temporalalignnet_tpu.parallel.mesh import make_mesh
    from temporalalignnet_tpu.train.end2end import (
        E2ETrainState,
        S3DWithText,
        make_e2e_optimizer,
        make_e2e_train_step,
    )
    from temporalalignnet_tpu.utils import AverageMeter, MetricsWriter, StepTimer

    tokenizer = Word2VecTokenizer(args.vocab, max_words=args.max_words)
    dataset = HTMClipDataset(
        args.htm_aa_csv,
        args.video_root,
        tokenizer=tokenizer,
        num_frames=args.num_frames,
        fps=args.fps,
        num_sample_per_video=args.num_sample_per_video,
        crop_size=args.crop_size,
        max_words=args.max_words,
    )
    if len(dataset) == 0:
        raise SystemExit("no videos found")

    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    tcfg = TrainConfig(
        lr=args.lr,
        wd=args.wd,
        epochs=args.epochs,
        warmup_iterations=args.warmup_iterations,
        total_iterations=steps_per_epoch * args.epochs,
        backprop_freq=args.backprop_freq,
        seed=args.seed,
    )
    mesh = make_mesh(-1, 1) if jax.device_count() > 1 else None

    on_tpu = jax.default_backend() == "tpu"
    model = S3DWithText(
        vocab_size=tokenizer.vocab_size,
        freeze_early=bool(args.freeze_early),
        train_bn_stats=bool(args.train_bn_stats),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )

    rng = np.random.RandomState(args.seed)
    sample = dataset.sample(0, rng)
    T, S, W = args.num_frames, args.crop_size, args.max_words
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(sample["clips"]),
        jnp.asarray(sample["input_ids"]),
    )
    if args.pretrain:
        from temporalalignnet_tpu.checkpoint import neq_merge

        loaded = load_milnce_checkpoint(args.pretrain)
        params, rep1 = neq_merge(
            jax.device_get(variables["params"]),
            {"video": loaded["params"],
             **({"text": loaded["text_params"]} if loaded["text_params"] else {})},
        )
        # batch_stats is the S3D tree itself (not nested under 'video' —
        # see S3DWithText.init / video_embed)
        stats, rep2 = neq_merge(
            jax.device_get(variables["batch_stats"]), loaded["batch_stats"]
        )
        for line in rep1 + rep2:
            print(f"[pretrain] {line}")
        variables = {"params": params, "batch_stats": stats}

    tx = make_e2e_optimizer(tcfg, variables["params"])
    state = E2ETrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
        opt_state=tx.init(jax.tree_util.tree_map(jnp.asarray, variables["params"])),
    )
    step_fn = make_e2e_train_step(model, tx, args.temperature)

    exp_dir = os.path.join(
        args.prefix, f"e2e_bs{args.batch_size}_lr{args.lr}_f{args.num_frames}"
    )
    os.makedirs(exp_dir, exist_ok=True)
    ckpt = Checkpointer(exp_dir, best_metric="loss")
    writer = MetricsWriter(exp_dir, name="e2e")
    timer = StepTimer()
    loss_meter = AverageMeter("loss", ":.4f")

    loader = TrainLoader(
        dataset,
        args.batch_size,
        seed=args.seed,
        num_workers=args.num_workers,
        device_put=make_device_put(mesh) if mesh else None,
    )
    global_step = 0
    stop = False
    last = {}
    for epoch in range(args.epochs):
        if stop:
            break
        loader.set_epoch(epoch)
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            global_step += 1
            loss_meter.update(float(metrics["loss"]))
            sps = timer.tick()
            last = {k: float(v) for k, v in metrics.items()}
            if global_step % args.log_every == 0:
                writer.add_scalars(global_step, {**last, "device/sps": sps}, "e2e/")
                print(f"Epoch {epoch} step {global_step}: {loss_meter}", flush=True)
            if args.runtime_save_iter and global_step % args.runtime_save_iter == 0:
                ckpt.save_runtime(jax.device_get(state), global_step)
            if args.max_steps and global_step >= args.max_steps:
                stop = True
                break
        ckpt.save_epoch(jax.device_get(state), epoch, {"loss": -loss_meter.avg})
    ckpt.wait()
    ckpt.close()
    writer.close()
    print(json.dumps({"final_step": global_step, **last}))
    return last


if __name__ == "__main__":
    main()
