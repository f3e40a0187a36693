"""Training CLI — the ``train/main.py`` equivalent.

Usage (mirrors reference train/main.py:538-544 / train/config.py:6-53):

  python -m temporalalignnet_tpu.train --model init \\
      --feature_dir /data/htm_features --captions /data/sentencified_htm_370k.json \\
      --batch_size 64 --epochs 20

  python -m temporalalignnet_tpu.train --model cotrain --pretrain <ckpt> \\
      --loss_threshold 0.5 ...

Differences by design:
- one pjit program per step (fwd+loss+grad+EMA), bf16 compute, no GradScaler;
- DP x TP mesh instead of (absent) DDP — multi-chip works out of the box;
- frozen dataclass configs instead of a mutable args namespace threaded into
  the loss (train/config.py:56-87);
- checkpoints are orbax TrainStates; --pretrain also accepts a reference
  .pth.tar through the converter (the Stage-1 -> Stage-2 remap of
  train/main.py:463-484 becomes stage1_to_stage2()).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("temporalalignnet_tpu trainer")
    # model (train/config.py:7-20)
    p.add_argument("--model", default="init", choices=["init", "cotrain"])
    p.add_argument("--language_model", default="word2vec",
                   choices=["word2vec", "bert"])
    p.add_argument("--bert_dir", default=None,
                   help="local HF directory (config.json / vocab.txt / optional "
                   "weights) for --language_model bert (reference "
                   "tan_model.py:37-38 loads bert-base-uncased; this image has "
                   "no egress, so weights must be local)")
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--num_joint_layers", type=int, default=6)
    p.add_argument("--width", type=int, default=512,
                   help="transformer width (the reference hardcodes 512; its "
                   "--hidden_dim flag is parsed but dead, SURVEY §2.4)")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--sim", default="cos", choices=["cos", "dot"])
    p.add_argument("--pos_enc", default="learned", choices=["learned", "sine"])
    p.add_argument("--use_text_pos_enc", type=int, default=0)
    p.add_argument("--use_alignability_head", type=int, default=0)
    p.add_argument("--video_embed_dim", type=int, default=1024)
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize encoder blocks in the backward pass "
                        "(jax.checkpoint): trades ~1 extra forward of FLOPs "
                        "for dropping per-block activations from HBM — use "
                        "when growing batch OOMs on activations; numerics "
                        "and the param tree are unchanged")
    # loss (train/config.py:21-30)
    p.add_argument("--fused_milnce", default="auto", choices=["auto", "0", "1"],
                   help="fused sim+masked-logsumexp MIL-NCE Pallas kernel "
                        "(measured +4%% Stage-1 / +16%% Stage-2 steps/s at "
                        "B<=96 via the untiled plan; ~par with the XLA logits "
                        "path at B>=128 via the column-tiled plan, with far "
                        "lower HBM pressure — no [B,S,T,B,N] logits. Under a "
                        "multi-chip mesh it runs per-device via shard_map "
                        "with pmax/psum column-lse merge. auto = on whenever "
                        "fused_milnce_supported says a kernel plan exists "
                        "for the training shape)")
    p.add_argument("--loss_threshold", type=float, default=0.0)
    p.add_argument("--learn_agreement", type=int, default=0)
    p.add_argument("--temporal_agreement_type", default="keep",
                   choices=["i", "u", "keep", "keep-joint"])
    p.add_argument("--optim_policy", default="default", choices=["default", "bce"])
    p.add_argument("--momentum_m", type=float, default=0.999)
    # data (train/config.py:11-16)
    p.add_argument("--feature_dir", required=True)
    p.add_argument("--captions", required=True)
    p.add_argument("--holdout", default=None)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--max_sentences", type=int, default=16)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument(
        "--cache_videos", type=int, default=256,
        help="per-video host cache (memmapped features + caption token ids; "
        "bit-identical to reloading — see tools/bench_loader.py); 0 disables",
    )
    p.add_argument("--vocab", default=None, help="word list .npy (s3d_dict format)")
    p.add_argument("--milnce_ckpt", default=None,
                   help="s3d_howto100m.pth: initialize the word2vec tower from "
                   "MIL-NCE weights (the reference always does, "
                   "word2vec_model.py:10-23)")
    # optim (train/config.py:31-40)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--warmup_iterations", type=int, default=1000)
    p.add_argument("--backprop_freq", type=int, default=1)
    p.add_argument("--clip_grad_norm", type=float, default=0.0)
    p.add_argument("--clip_mode", default="per_param", choices=["per_param", "global"])
    p.add_argument("--skip_nonfinite", type=int, default=0,
                   help="skip optimizer steps with non-finite grads (the "
                   "reference backprops NaN losses)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--disable_jit", action="store_true",
                   help="debug: run op-by-op (jax.disable_jit)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize for multi-host pods")
    p.add_argument("--coordinator", default=None,
                   help="explicit coordinator address host:port for --multihost "
                   "(autodetected on Cloud TPU pods / SLURM when omitted)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # infra
    p.add_argument("--prefix", default="exp", help="experiment dir root")
    p.add_argument("--name_prefix", default="")
    p.add_argument("--resume", default=None)
    p.add_argument("--pretrain", default=None)
    p.add_argument("--test", default=None, help="ckpt: run downstream eval only")
    p.add_argument("--runtime_save_iter", type=int, default=1000)
    p.add_argument("--eval_every_epochs", type=int, default=1)
    p.add_argument("--log_every", type=int, default=5)
    p.add_argument("--dp", type=int, default=-1, help="data-parallel mesh size")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    p.add_argument("--align_anno", default=None, help="htm_align.json for downstream eval")
    p.add_argument("--align_features", default=None)
    p.add_argument("--yc2_anno", default=None)
    p.add_argument("--yc2_features", default=None)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--max_steps", type=int, default=0, help="debug: stop after N steps")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per jit dispatch (lax.scan over stacked "
                        "batches); >1 amortizes per-dispatch tunnel latency + the "
                        "per-step loss fetch. Save/eval/stop checks fire at "
                        "dispatch-group boundaries.")
    return p


def resolve_fused_milnce(flag: str, batch_size: int, seq_len: int,
                         max_sentences: int, width: int,
                         backend: Optional[str] = None) -> bool:
    """'auto'/'0'/'1' -> concrete kernel decision for the training shape.

    auto = on TPU whenever a kernel plan (untiled or column-tiled) exists for
    R=B*T rows x K=B*N text columns over width-C features (measured +16%
    stage-2 at B<=96, par with lower HBM pressure at B>=128).  Uses the
    conservative single-device R; a dp mesh only shrinks per-device rows.
    Off-TPU auto resolves to False: there the kernel runs in interpreter
    mode (a test vehicle, strictly slower than XLA) — force with '1'.
    """
    if flag != "auto":
        return flag == "1"
    import jax

    if (backend or jax.default_backend()) != "tpu":
        return False
    return fused_milnce_supported_for(batch_size, seq_len, max_sentences, width)


def fused_milnce_supported_for(batch_size: int, seq_len: int,
                               max_sentences: int, width: int) -> bool:
    from temporalalignnet_tpu.ops.pallas_milnce import fused_milnce_supported

    return fused_milnce_supported(
        batch_size * seq_len, batch_size * max_sentences, width, 2
    )


def experiment_name(args) -> str:
    """Hyperparams-in-dirname convention (reference train/config.py:69-74)."""
    return (
        f"{args.name_prefix}{args.model}_{args.language_model}"
        f"_len{args.seq_len}_e{args.num_encoder_layers}d{args.num_joint_layers}"
        f"_bs{args.batch_size}_lr{args.lr}"
    )


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
    if args.disable_jit:
        jax.config.update("jax_disable_jit", True)

    from temporalalignnet_tpu.checkpoint import (
        Checkpointer,
        load_reference_checkpoint,
        stage1_to_stage2,
    )
    from temporalalignnet_tpu.core.config import (
        DataConfig,
        EvalConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
    )
    from temporalalignnet_tpu.data import (
        HTMAlignDataset,
        HTMFeatureDataset,
        TrainLoader,
        YC2RetrievalDataset,
        make_device_put,
    )
    from temporalalignnet_tpu.eval.align import AlignmentEvaluator
    from temporalalignnet_tpu.eval.retrieval import RetrievalEvaluator
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer
    from temporalalignnet_tpu.parallel.mesh import make_mesh
    from temporalalignnet_tpu.train.train_step import (
        TrainState,
        create_train_state,
        make_train_step,
        shard_batch,
    )
    from temporalalignnet_tpu.utils import (
        AverageMeter,
        MetricsWriter,
        ProgressMeter,
        StepBreakdown,
        StepTimer,
        device_memory_stats,
        trace,
    )

    # ---- configs (cotrain preset forces agreement + head, train/main.py:361-363)
    if args.model == "cotrain":
        args.learn_agreement = 1
        args.use_alignability_head = 1

    fused = resolve_fused_milnce(
        args.fused_milnce, args.batch_size, args.seq_len,
        args.max_sentences, args.width,
    )
    if args.fused_milnce == "auto":
        print(f"[fused_milnce] auto -> {int(fused)}")

    mcfg = ModelConfig(
        width=args.width,
        heads=args.heads,
        num_encoder_layers=args.num_encoder_layers,
        num_joint_layers=args.num_joint_layers,
        video_embed_dim=args.video_embed_dim,
        language_model=args.language_model,
        sim=args.sim,
        pos_enc=args.pos_enc,
        use_text_pos_enc=bool(args.use_text_pos_enc),
        use_alignability_head=bool(args.use_alignability_head),
        fused_milnce=fused,
    )
    loss_cfg = LossConfig(
        model=args.model,
        sim=args.sim,
        learn_agreement=bool(args.learn_agreement),
        temporal_agreement_type=args.temporal_agreement_type,
        loss_threshold=args.loss_threshold,
        use_alignability_head=bool(args.use_alignability_head),
        optim_policy=args.optim_policy,
        use_fused_milnce=fused,
    )
    dcfg = DataConfig(
        seq_len=args.seq_len,
        max_sentences=args.max_sentences,
        max_words=args.max_words,
        batch_size=args.batch_size,
        feature_dim=args.video_embed_dim,
    )

    # ---- data
    bert_config = None
    if args.language_model == "bert":
        # HF tokenizer + config from a local dir (train/main.py:291-292)
        if not args.bert_dir:
            raise SystemExit("--language_model bert requires --bert_dir")
        from transformers import BertConfig, BertTokenizer

        tokenizer = BertTokenizer.from_pretrained(args.bert_dir)
        bert_config = BertConfig.from_pretrained(args.bert_dir)
    elif args.vocab:
        tokenizer = Word2VecTokenizer(args.vocab, max_words=args.max_words)
    else:
        raise SystemExit("--vocab is required (s3d_dict.npy word list)")
    dataset = HTMFeatureDataset(
        args.feature_dir, args.captions, dcfg, "train", tokenizer,
        holdout=args.holdout, cache_videos=args.cache_videos,
    )
    if len(dataset) == 0:
        raise SystemExit("no training videos after filtering")
    if len(dataset) < args.batch_size:
        print(
            f"WARNING: dataset ({len(dataset)} videos) smaller than "
            f"--batch_size {args.batch_size}; with drop_last every epoch would "
            "be empty — clamping batch_size"
        )
        args.batch_size = len(dataset)
        dcfg = dataclasses.replace(dcfg, batch_size=args.batch_size)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    tcfg = TrainConfig(
        lr=args.lr,
        wd=args.wd,
        epochs=args.epochs,
        warmup_iterations=args.warmup_iterations,
        total_iterations=steps_per_epoch * args.epochs,
        backprop_freq=args.backprop_freq,
        clip_grad_norm=args.clip_grad_norm,
        clip_mode=args.clip_mode,
        skip_nonfinite_updates=bool(args.skip_nonfinite),
        ema_momentum=args.momentum_m,
        seed=args.seed,
        runtime_save_iter=args.runtime_save_iter,
        dp_size=args.dp,
        tp_size=args.tp,
    )

    # ---- experiment dir + config dump (train/config.py:56-87); side effects
    # master-gated in a multi-process runtime (main_nce.py:119,406-407)
    from temporalalignnet_tpu.parallel.distributed import is_master

    exp_dir = os.path.join(args.prefix, experiment_name(args))
    if is_master():
        os.makedirs(exp_dir, exist_ok=True)
        with open(os.path.join(exp_dir, "running_command.txt"), "a") as f:
            f.write(json.dumps(vars(args)) + "\n")

    mesh = make_mesh(args.dp, args.tp) if jax.device_count() > 1 else None
    # multi-process feed: every host derives the same global epoch order but
    # builds only the batch rows its devices own (DistributedSampler parity,
    # end2end/main_nce.py:229-231); put_global assembles the global arrays
    local_rows = None
    if jax.process_count() > 1:
        from temporalalignnet_tpu.parallel.mesh import local_batch_rows

        assert mesh is not None, "multi-process runtime requires a mesh"
        local_rows = local_batch_rows(mesh, args.batch_size)
        print(f"[multihost] process {jax.process_index()}/{jax.process_count()} "
              f"builds batch rows [{local_rows[0]}, {local_rows[1]})")
    model = TANWithText(
        mcfg, vocab_size=tokenizer.vocab_size, dtype=jnp.bfloat16
        if jax.default_backend() == "tpu" else jnp.float32,
        remat=bool(args.remat),
        bert_config=bert_config,
    )

    # ---- downstream evaluators (train/main.py:165-212); cached so their jitted
    # programs compile once and are reused across the per-1000-iter eval calls
    _eval_cache: dict = {}

    def evaluate_downstream(params, step: int, writer=None) -> dict:
        metrics = {}
        if args.align_anno:
            if "align" not in _eval_cache:
                ds = HTMAlignDataset(
                    args.align_features or args.feature_dir,
                    args.align_anno,
                    tokenizer,
                    max_words=args.max_words,
                )
                ev = AlignmentEvaluator(
                    model, params,
                    EvalConfig(seq_len=args.seq_len,
                               use_alignability_head=mcfg.use_alignability_head),
                    mesh=mesh,
                )
                _eval_cache["align"] = (ev, list(ds))
            ev, corpus = _eval_cache["align"]
            ev.params = params
            metrics.update(ev.evaluate(corpus))
        if args.yc2_anno and args.optim_policy != "bce":  # bce skips YC2 (main.py:196-197)
            if "yc2" not in _eval_cache:
                ds = YC2RetrievalDataset(
                    args.yc2_features or args.feature_dir,
                    args.yc2_anno,
                    "val",
                    tokenizer,
                    max_words=args.max_words,
                )
                ev = RetrievalEvaluator(
                    model, params, EvalConfig(seq_len=args.seq_len), mesh=mesh,
                )
                _eval_cache["yc2"] = (ev, list(ds))
            ev, items = _eval_cache["yc2"]
            ev.params = params
            metrics.update(ev.evaluate(items))
        if metrics:
            print(f"[eval @ step {step}] " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
            if writer is not None:
                writer.add_scalars(step, metrics, prefix="eval/")
        return metrics

    # ---- init / resume / pretrain / test
    rng = np.random.RandomState(args.seed)
    k_disp = max(1, args.steps_per_dispatch)
    loader = TrainLoader(
        dataset,
        args.batch_size,
        seed=args.seed,
        num_workers=args.num_workers,
        # grouped dispatch stacks K host batches then device_puts the stack
        device_put=make_device_put(mesh) if (mesh and k_disp == 1) else None,
        local_rows=local_rows,
    )
    sample = dataset.sample(0, rng)
    sample_batch = {
        k: jnp.asarray(np.broadcast_to(v, (args.batch_size,) + np.asarray(v).shape))
        for k, v in sample.items()
        if k not in ("cut_start", "cut_end")
    }
    state, tx = create_train_state(model, tcfg, loss_cfg, sample_batch,
                                   seed=args.seed, mesh=mesh)

    if args.language_model == "bert" and args.bert_dir:
        # pretrained weights are optional (a config-only dir trains from
        # scratch); when present, graft them under params['lang_model']['bert']
        weight_files = ("flax_model.msgpack", "model.safetensors", "pytorch_model.bin")
        if any(os.path.exists(os.path.join(args.bert_dir, f)) for f in weight_files):
            from transformers import FlaxBertModel

            from temporalalignnet_tpu.checkpoint import neq_merge

            fb = FlaxBertModel.from_pretrained(
                args.bert_dir,
                from_pt=not os.path.exists(
                    os.path.join(args.bert_dir, "flax_model.msgpack")
                ),
            )
            merged, report = neq_merge(
                jax.device_get(state.params), {"lang_model": {"bert": fb.params}}
            )
            for line in report:
                if "lang_model" in line:
                    print(f"[bert] {line}")
            state = dataclasses.replace(
                state, params=jax.tree_util.tree_map(jnp.asarray, merged)
            )
            if state.ema_params is not None:
                state = dataclasses.replace(
                    state,
                    ema_params=jax.tree_util.tree_map(
                        lambda x: x.copy(), state.params
                    ),
                )
        else:
            print(f"[bert] no weight file in {args.bert_dir}; training from scratch")

    def _put_like(template, tree):
        # re-upload merged host leaves with the TEMPLATE's shardings — a bare
        # jnp.asarray lands everything on device 0 and breaks the jitted step
        # under a multi-device mesh (caught by the full-pipeline seam test)
        return jax.tree_util.tree_map(
            lambda t, v: jax.device_put(np.asarray(v), t.sharding),
            template, tree,
        )

    if args.milnce_ckpt:
        # pretrained MIL-NCE text tower (reference loads it unconditionally,
        # model/word2vec_model.py:10-23)
        from temporalalignnet_tpu.checkpoint import load_milnce_checkpoint, neq_merge

        text_params = load_milnce_checkpoint(args.milnce_ckpt)["text_params"]
        if text_params:
            merged, report = neq_merge(
                jax.device_get(state.params), {"lang_model": text_params}
            )
            for line in report:
                if "lang_model" in line:
                    print(f"[milnce] {line}")
            state = dataclasses.replace(
                state, params=_put_like(state.params, merged)
            )
            if state.ema_params is not None:
                state = dataclasses.replace(
                    state,
                    ema_params=_put_like(state.ema_params,
                                         jax.device_get(state.params)),
                )

    if args.test:
        params = _load_any_params(args.test, state)
        metrics = evaluate_downstream(params, step=0)
        print(json.dumps(metrics))
        return metrics

    if args.pretrain:
        from temporalalignnet_tpu.checkpoint import neq_merge

        loaded = _load_any_params(args.pretrain, state)
        # non-strict: a Stage-1 ckpt lacks binary_head etc. — keep fresh init
        merged, report = neq_merge(jax.device_get(state.params), loaded)
        for line in report:
            print(f"[pretrain] {line}")
        online, target = stage1_to_stage2(merged)
        state = dataclasses.replace(
            state,
            params=_put_like(state.params, online),
            ema_params=(
                _put_like(state.ema_params, target)
                if loss_cfg.model == "cotrain"
                else state.ema_params
            ),
        )

    ckpt = Checkpointer(exp_dir, best_metric="Recall")
    start_epoch, start_batch = 0, 0
    if args.resume:
        state = ckpt.restore(state)
        # epoch/iteration fidelity (reference train/main.py:443-444 restores
        # start_epoch=epoch+1; we derive both from the step counter, which also
        # recovers the mid-epoch position of a runtime checkpoint): the resumed
        # run replays neither data order nor the epoch-driven eval cadence.
        start_epoch = int(state.step) // steps_per_epoch
        start_batch = int(state.step) % steps_per_epoch
        print(
            f"resumed at step {int(state.step)} "
            f"(epoch {start_epoch}, batch {start_batch})"
        )

    if k_disp > 1:
        from temporalalignnet_tpu.train.train_step import (
            make_multi_train_step,
            stack_batches,
        )

        step_fn = make_multi_train_step(model, tx, tcfg, loss_cfg, mesh=mesh)
    else:
        step_fn = make_train_step(model, tx, tcfg, loss_cfg, mesh=mesh)
    # metrics/checkpoint writes are master-only in a multi-process runtime
    # (reference master-gates TB + ckpt, main_nce.py:119,193-200,388)
    writer = MetricsWriter(exp_dir) if is_master() else None
    timer = StepTimer()
    breakdown = StepBreakdown()

    loss_meter = AverageMeter("loss", ":.4f")
    data_meter = AverageMeter("data", ":.3f")
    final_metrics = {}
    global_step = int(state.step)
    last_check = global_step
    stop = False

    with trace(args.profile_dir):
        for epoch in range(start_epoch, args.epochs):
            if stop:
                break
            loader.set_epoch(epoch, start_batch if epoch == start_epoch else 0)
            progress = ProgressMeter(len(loader), [loss_meter, data_meter],
                                     prefix=f"Epoch {epoch} ")
            t_data = time.perf_counter()
            pending = []
            # batches this epoch will actually yield: a mid-epoch resume starts
            # the loader at start_batch, so the tail-group flush must key off
            # the yield count, not len(loader)
            n_yield = len(loader) - (start_batch if epoch == start_epoch else 0)
            for it, batch in enumerate(loader):
                dt_data = time.perf_counter() - t_data
                data_meter.update(dt_data)
                breakdown.add("data", dt_data)
                batch = {k: v for k, v in batch.items()
                         if k not in ("cut_start", "cut_end")}
                if k_disp == 1:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    with breakdown.measure("dispatch"):
                        state, metrics = step_fn(state, batch)
                    # the scalar fetch fences the device step; its duration is
                    # the device-bound share of the iteration (StepBreakdown)
                    with breakdown.measure("fence"):
                        rows = [(metrics, float(metrics["loss"]))]
                else:
                    pending.append(batch)
                    if len(pending) < k_disp and it < n_yield - 1:
                        t_data = time.perf_counter()
                        continue
                    # group dispatch: one lax.scan program runs len(pending)
                    # optimizer steps; a shorter epoch-tail group is a separate
                    # (once-per-run) compile
                    with breakdown.measure("dispatch"):
                        stacked = stack_batches(pending, mesh)
                        state, mk = step_fn(state, stacked)
                    kk = len(pending)
                    pending = []
                    with breakdown.measure("fence"):
                        mk = {k: np.asarray(v) for k, v in mk.items()}
                    rows = [
                        ({k: v[i] for k, v in mk.items()}, float(mk["loss"][i]))
                        for i in range(kk)
                    ]
                for metrics, loss in rows:
                    global_step += 1
                    if np.isfinite(loss):  # NaN excluded from meters (main.py:108-109)
                        loss_meter.update(loss)
                    sps = timer.tick()
                    if global_step % args.log_every == 0 and writer is not None:
                        scalars = {k: float(v) for k, v in metrics.items()}
                        scalars["device/sps"] = sps
                        scalars.update(
                            {f"device/{k}": v for k, v in breakdown.snapshot().items()}
                        )
                        scalars.update(
                            {f"device/{k}": v for k, v in device_memory_stats().items()}
                        )
                        writer.add_scalars(global_step, scalars, prefix="train/")
                        progress.display(it)
                # save/eval/stop checks fire once per dispatch group; with
                # k_disp>1 a boundary crossed mid-group fires here (state only
                # exists at group granularity)
                if args.runtime_save_iter and (
                    global_step // args.runtime_save_iter
                    > last_check // args.runtime_save_iter
                ):
                    # orbax saves are multi-process coordinated — EVERY
                    # process must call save (orbax master-gates the writes
                    # and barriers internally); do not is_master()-gate this.
                    # The on-device state goes straight to orbax: its async
                    # save stages d2h then writes on a background thread, so
                    # the step chain never waits for the disk (an explicit
                    # device_get here serializes the full fetch first —
                    # measured multi-second through the tunnel).
                    ckpt.save_runtime(state, global_step)
                    evaluate_downstream(state.params, global_step, writer)
                last_check = global_step
                if args.max_steps and global_step >= args.max_steps:
                    if global_step > args.max_steps:
                        # grouped dispatch: state only exists at group
                        # granularity, so the final group may run past
                        # --max_steps — say so instead of stopping silently
                        print(
                            f"[stop] --steps_per_dispatch group overshot "
                            f"--max_steps {args.max_steps} by "
                            f"{global_step - args.max_steps} steps "
                            f"(stopped at {global_step})"
                        )
                    stop = True
                    break
                t_data = time.perf_counter()
            final_metrics = evaluate_downstream(state.params, global_step, writer) \
                if (epoch + 1) % args.eval_every_epochs == 0 else final_metrics
            # orbax coordinates multi-process writes itself — all processes
            # must participate (no is_master gate, see save_runtime above);
            # on-device state: async save, no explicit device_get fetch
            ckpt.save_epoch(state, epoch, final_metrics)
            # bare-params export: the portable artifact --pretrain consumes
            from temporalalignnet_tpu.checkpoint import save_params

            save_params(
                os.path.join(exp_dir, "params_latest"),
                state.params,
                overwrite=True,
            )
            if state.ema_params is not None:
                # the twin's target half — what tools/export_torch.py packs
                # into the reference's Stage-2 ``target.*`` key space
                save_params(
                    os.path.join(exp_dir, "ema_latest"),
                    state.ema_params,
                    overwrite=True,
                )

    ckpt.wait()
    ckpt.close()
    if writer is not None:
        writer.close()
    print(json.dumps({"final_step": global_step, **final_metrics}))
    return final_metrics


def _load_any_params(path: str, state):
    """Accept a reference .pth.tar (converter), an experiment dir written by this
    trainer (TrainState restore -> params), or a bare orbax params dir."""
    import os

    import jax
    import numpy as np

    if path.endswith((".pth.tar", ".pth", ".tar")):
        from temporalalignnet_tpu.checkpoint import load_reference_checkpoint

        return load_reference_checkpoint(path)["params"]
    if os.path.isdir(os.path.join(path, "params_latest")):
        path = os.path.join(path, "params_latest")  # experiment dir -> its export
    from temporalalignnet_tpu.checkpoint import load_params

    # raw (structure-from-disk) restore so the caller can neq_merge across
    # architecture deltas (e.g. Stage-1 ckpt without binary_head)
    return load_params(path)


if __name__ == "__main__":
    main()
