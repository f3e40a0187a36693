"""End-to-end S3D fine-tune CLI — the ``end2end/main_nce.py`` equivalent.

  python -m temporalalignnet_tpu.train.end2end_cli \\
      --htm_aa_csv htm_aa_v1.csv --video_root /data/videos \\
      --vocab s3d_dict.npy --pretrain s3d_howto100m.pth ...

This is the reference's one genuinely multi-node path (NCCL DDP init from
SLURM/launcher env, main_nce.py:140-158; DistributedSampler per-rank data
sharding, :229-231; DDP grad all-reduce, :283-285; master-gated checkpoints,
:119,388).  The TPU-native equivalent here:

- ``--multihost`` wires every host into one jax.distributed runtime
  (parallel/distributed.py); the ('data',) mesh then spans all chips and
  GSPMD inserts the gradient/negative all-reduces over ICI/DCN;
- every process derives the same global epoch order but BUILDS only the
  clip-batch rows its devices own (TrainLoader local_rows — the
  DistributedSampler parity) and put_global assembles the global batch with
  no cross-host input copies;
- metrics/log side effects are master-gated; orbax checkpoint saves are
  called by EVERY process (orbax master-gates the writes and barriers
  internally — gating the call deadlocks the non-master processes).
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
    p.add_argument("--batch_size", type=int, default=16,
                   help="GLOBAL batch (videos per optimizer step across all "
                        "hosts); each process builds only its own rows")
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
    p.add_argument("--num_classes", type=int, default=512,
                   help="joint embedding dim (s3dg.py fc output; 512 in the "
                        "reference recipe — smaller values are for smoke tests)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--prefix", default="exp_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=5)
    p.add_argument("--runtime_save_iter", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--decoder", default="ffmpeg", choices=["ffmpeg", "synthetic"],
                   help="synthetic = deterministic pseudo-frames from the clip "
                        "identity (no ffmpeg binary needed; smoke tests)")
    p.add_argument("--check_existence", type=int, default=1,
                   help="0 skips the per-video file-existence filter "
                        "(video_loader.py:71-73)")
    # multi-host (the DDP/SLURM plumbing of main_nce.py:140-158)
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize for multi-host pods")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port for --multihost (autodetected "
                        "on Cloud TPU pods / SLURM when omitted)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--debug_batch_hash", type=int, default=0,
                   help="1 = print a crc32 of every GLOBAL batch tensor "
                        "(topology-parity debugging; costs an all-gather)")
    return p


def main(argv: Optional[list] = None) -> dict:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.multihost:
        from temporalalignnet_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from temporalalignnet_tpu.checkpoint import (
        Checkpointer,
        load_milnce_checkpoint,
        save_params,
    )
    from temporalalignnet_tpu.core.config import TrainConfig
    from temporalalignnet_tpu.data.clips import HTMClipDataset, synthetic_decode
    from temporalalignnet_tpu.data.prefetch import TrainLoader, make_device_put
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer
    from temporalalignnet_tpu.parallel.distributed import is_master, master_print
    from temporalalignnet_tpu.parallel.mesh import (
        local_batch_rows,
        make_mesh,
        put_from_host,
        replicated_sharding,
    )
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
        decoder=synthetic_decode if args.decoder == "synthetic" else None,
        check_existence=bool(args.check_existence),
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

    # per-process clip feed: same global epoch order everywhere, each host
    # builds only its batch-row slab (DistributedSampler parity,
    # end2end/main_nce.py:229-231)
    local_rows = None
    if jax.process_count() > 1:
        assert mesh is not None, "multi-process runtime requires a mesh"
        local_rows = local_batch_rows(mesh, args.batch_size)
        print(f"[multihost] process {jax.process_index()}/{jax.process_count()} "
              f"builds batch rows [{local_rows[0]}, {local_rows[1]})")

    on_tpu = jax.default_backend() == "tpu"
    model = S3DWithText(
        num_classes=args.num_classes,
        vocab_size=tokenizer.vocab_size,
        freeze_early=bool(args.freeze_early),
        train_bn_stats=bool(args.train_bn_stats),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )

    rng = np.random.RandomState(args.seed)
    sample = dataset.sample(0, rng)
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
            master_print(f"[pretrain] {line}")
        variables = {"params": params, "batch_stats": stats}

    tx = make_e2e_optimizer(tcfg, variables["params"])
    state = E2ETrainState(
        step=jnp.zeros((), jnp.int32),
        params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
        opt_state=tx.init(jax.tree_util.tree_map(jnp.asarray, variables["params"])),
    )
    if mesh is not None:
        # commit every state leaf replicated onto the (possibly multi-process)
        # mesh: init is seed-deterministic so every host holds the same
        # values, and jit over a global mesh rejects per-process local arrays
        # next to globally-sharded batches.  No TP rules here — S3D is convs.
        rep = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(
            lambda x: put_from_host(np.asarray(x), rep), state
        )
    step_fn = make_e2e_train_step(model, tx, args.temperature)

    exp_dir = os.path.join(
        args.prefix, f"e2e_bs{args.batch_size}_lr{args.lr}_f{args.num_frames}"
    )
    if is_master():
        os.makedirs(exp_dir, exist_ok=True)
    # checkpoint + metric side effects: writer/prints master-only; orbax save
    # calls on EVERY process (it master-gates writes + barriers internally)
    ckpt = Checkpointer(exp_dir, best_metric="loss")
    writer = MetricsWriter(exp_dir, name="e2e") if is_master() else None
    timer = StepTimer()
    loss_meter = AverageMeter("loss", ":.4f")

    loader = TrainLoader(
        dataset,
        args.batch_size,
        seed=args.seed,
        num_workers=args.num_workers,
        device_put=make_device_put(mesh) if mesh else None,
        local_rows=local_rows,
    )
    global_step = 0
    stop = False
    last = {}
    for epoch in range(args.epochs):
        if stop:
            break
        loader.set_epoch(epoch)
        for batch in loader:
            if mesh is None:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if args.debug_batch_hash:
                # bitwise global-batch fingerprint: the DistributedSampler
                # parity contract (main_nce.py:229-231) says per-process row
                # slabs must reassemble the exact single-process batch.
                # fetch_global is a collective — every process participates,
                # master prints.
                import zlib

                from temporalalignnet_tpu.parallel.mesh import fetch_global

                for k in sorted(batch):
                    v = fetch_global(batch[k])
                    crc = zlib.crc32(np.ascontiguousarray(v).tobytes())
                    master_print(f"[batchhash] {global_step} {k} {crc:08x}",
                                 flush=True)
            state, metrics = step_fn(state, batch)
            global_step += 1
            loss_meter.update(float(metrics["loss"]))
            sps = timer.tick()
            last = {k: float(v) for k, v in metrics.items()}
            if global_step % args.log_every == 0:
                if writer is not None:
                    writer.add_scalars(
                        global_step, {**last, "device/sps": sps}, "e2e/"
                    )
                master_print(
                    f"Epoch {epoch} step {global_step}: {loss_meter}", flush=True
                )
            if args.runtime_save_iter and global_step % args.runtime_save_iter == 0:
                # on-device state straight to the async save (r3: an explicit
                # device_get first serializes the full d2h fetch — measured
                # 43.7 vs 37.8 s on the 820 MB stage-2 state)
                ckpt.save_runtime(state, global_step)
            if args.max_steps and global_step >= args.max_steps:
                stop = True
                break
        ckpt.save_epoch(state, epoch, {"loss": -loss_meter.avg})
    # portable bare-params export (what --pretrain / eval tooling consume)
    save_params(os.path.join(exp_dir, "params_latest"), state.params,
                overwrite=True)
    ckpt.wait()
    ckpt.close()
    if writer is not None:
        writer.close()
    print(json.dumps({"final_step": global_step, **last}))
    return last


if __name__ == "__main__":
    main()
