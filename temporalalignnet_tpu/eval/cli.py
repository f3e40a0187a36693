"""Zero-shot evaluation CLI — the standalone harnesses of
eval/eval_zeroshot_align.py:255 and eval/eval_zeroshot_retrieval.py:259.

  python -m temporalalignnet_tpu.eval --task align \\
      --ckpt model.pth.tar --features <dir> --anno htm_align.json --vocab s3d_dict.npy

  python -m temporalalignnet_tpu.eval --task retrieval \\
      --ckpt <orbax-params-dir> --features <dir> --anno youcookii_annotations_trainval.json ...

With --ckpt absent it scores raw features with a 0-layer model — the reference's
MIL-NCE/CLIP baseline mode (eval_zeroshot_align.py:262-276).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("temporalalignnet_tpu zero-shot eval")
    p.add_argument("--task", required=True, choices=["align", "retrieval"])
    p.add_argument("--ckpt", default=None, help=".pth.tar or orbax params dir; "
                   "omit for the raw-feature baseline")
    p.add_argument("--milnce_ckpt", default=None,
                   help="baseline mode: s3d_howto100m.pth for the word2vec "
                   "text tower + 1024->512 fc (eval_zeroshot_align.py:264-291)")
    p.add_argument("--baseline_sim", default="dot", choices=["dot", "cos"],
                   help="baseline similarity: dot for MIL-NCE, cos for CLIP")
    p.add_argument("--clip_text_ckpt", default=None,
                   help="baseline mode: torch state_dict of an HF "
                   "CLIPTextModel(/WithProjection or full CLIPModel) — "
                   "encodes captions with the CLIP text tower, the "
                   "reference's clip.encode_text baseline "
                   "(eval_zeroshot_align.py:294-327); use with CLIP visual "
                   "features, --baseline_sim cos and --video_embed_dim set "
                   "to the CLIP embed dim (512 for B/32)")
    p.add_argument("--clip_vocab", default=None,
                   help="HF-style CLIP vocab.json (with --clip_merges)")
    p.add_argument("--clip_merges", default=None, help="HF-style merges.txt")
    p.add_argument("--clip_bpe", default=None,
                   help="alternative: OpenAI bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--clip_context", type=int, default=77,
                   help="CLIP tokenizer context length")
    p.add_argument("--clip_text_heads", type=int, default=8,
                   help="text-tower heads (not in the state_dict; 8 for "
                   "B/32 and B/16, 12 for L/14)")
    p.add_argument("--clip_hidden_act", default="quick_gelu",
                   choices=["quick_gelu", "gelu"],
                   help="must match the checkpoint config's hidden_act")
    p.add_argument("--features", required=True)
    p.add_argument("--anno", required=True)
    p.add_argument("--vocab", default=None,
                   help="s3d_dict.npy word list (required for word2vec)")
    p.add_argument("--language_model", default="word2vec",
                   choices=["word2vec", "bert"])
    p.add_argument("--bert_dir", default=None,
                   help="local HF dir (config.json/vocab.txt) for bert")
    p.add_argument("--method", default="overlap-seq", choices=["overlap-seq", "global"])
    p.add_argument("--global_buckets", type=int, default=3,
                   help="method=global: max padded-length buckets (= compiled "
                        "programs) the corpus splits into; tunnel compiles "
                        "cost minutes each, so keep this small")
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--video_embed_dim", type=int, default=1024)
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--num_joint_layers", type=int, default=6)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--use_alignability_head", type=int, default=1)
    p.add_argument("--num_clips", type=int, default=10)
    p.add_argument("--batch_windows", type=int, default=32)
    p.add_argument("--use_pallas", default="auto", choices=["auto", "0", "1"],
                   help="Pallas fused attention for the eval forward. auto = "
                   "off: both CLI tasks run paths where XLA fusion is the "
                   "measured winner (the align corpus canvas loses with the "
                   "kernel, 5.8 vs 5.1 s; retrieval never batches >= 512 "
                   "windows).  The kernel's measured +27%% win is the "
                   "WINDOWED forward at batches >= 512 (bench.py gates that "
                   "itself); pass 1 to force it here (IMPLEMENTATION_STATUS.md)")
    p.add_argument("--shard_eval", action="store_true",
                   help="shard window batches over all (global) devices")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize for pod-scale eval; "
                   "with --shard_eval the corpus shards over every host's "
                   "chips as ONE SPMD computation (inputs via put_from_host, "
                   "outputs all-gathered by fetch_global)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port for --multihost off-pod")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--f32", action="store_true",
                   help="force float32 compute (bf16 on TPU shifts metrics by "
                   "~1e-3 from accumulation order; f32 is bit-reproducible)")
    return p


def main(argv: Optional[list] = None) -> dict:
    args = build_parser().parse_args(argv)

    if args.multihost:  # before any backend touch
        from temporalalignnet_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from temporalalignnet_tpu.core.config import EvalConfig, ModelConfig
    from temporalalignnet_tpu.data import HTMAlignDataset, YC2RetrievalDataset
    from temporalalignnet_tpu.eval.align import AlignmentEvaluator
    from temporalalignnet_tpu.eval.retrieval import RetrievalEvaluator
    from temporalalignnet_tpu.models.net import TANWithText
    from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

    bert_config = None
    if args.language_model == "bert":
        if not args.bert_dir:
            raise SystemExit("--language_model bert requires --bert_dir")
        from transformers import BertConfig, BertTokenizer

        tokenizer = BertTokenizer.from_pretrained(args.bert_dir)
        bert_config = BertConfig.from_pretrained(args.bert_dir)
    elif args.clip_vocab or args.clip_bpe:
        from temporalalignnet_tpu.models.clip_text import CLIPTokenizer

        if args.clip_bpe:
            tokenizer = CLIPTokenizer.from_openai_bpe(
                args.clip_bpe, context_length=args.clip_context
            )
        else:
            if not args.clip_merges:
                raise SystemExit("--clip_vocab requires --clip_merges")
            tokenizer = CLIPTokenizer(
                args.clip_vocab, args.clip_merges,
                context_length=args.clip_context,
            )
    elif args.vocab:
        tokenizer = Word2VecTokenizer(args.vocab, max_words=args.max_words)
    else:
        raise SystemExit("--vocab is required for --language_model word2vec")
    baseline = args.ckpt is None
    dtype = (
        jnp.float32
        if args.f32 or jax.default_backend() != "tpu"
        else jnp.bfloat16
    )

    if baseline:
        # raw-feature harness (reference eval_zeroshot_align.py:255-359):
        # MIL-NCE mode projects 1024-d features through the s3d fc and uses
        # dot product; CLIP mode is cosine on the features directly
        from temporalalignnet_tpu.models.baseline import RawFeatureBaseline

        use_proj = args.milnce_ckpt is not None
        mcfg = ModelConfig(
            num_encoder_layers=0,
            num_joint_layers=1,
            video_embed_dim=args.video_embed_dim,
            sim=args.baseline_sim,
            use_alignability_head=False,
            random_pos_start=False,
        )
        text_tower = None
        clip_text_params = None
        if args.clip_text_ckpt:
            import torch

            from temporalalignnet_tpu.checkpoint import clip_text_torch_to_params
            from temporalalignnet_tpu.models.clip_text import CLIPTextEncoder

            sd = torch.load(
                args.clip_text_ckpt, map_location="cpu", weights_only=True
            )
            sd = sd.get("state_dict", sd)
            clip_text_params = clip_text_torch_to_params(sd)
            # geometry comes from the converted tree; heads/act are flags
            width = clip_text_params["token_embedding"]["embedding"].shape[1]
            vocab_rows = clip_text_params["token_embedding"]["embedding"].shape[0]
            context = clip_text_params["positional_embedding"].shape[0]
            layers = sum(k.startswith("resblocks_") for k in clip_text_params)
            embed_dim = (
                clip_text_params["proj"]["kernel"].shape[1]
                if "proj" in clip_text_params else 0
            )
            heads, act = args.clip_text_heads, args.clip_hidden_act
            text_tower = lambda: CLIPTextEncoder(
                vocab_size=vocab_rows, context_length=context, width=width,
                layers=layers, heads=heads, embed_dim=embed_dim, dtype=dtype,
                hidden_act=act,
            )
        model = RawFeatureBaseline(
            mcfg, vocab_size=tokenizer.vocab_size,
            use_visual_proj=use_proj, dtype=dtype, text_tower=text_tower,
        )
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, args.video_embed_dim)),
            jnp.zeros(
                (1, 2, getattr(tokenizer, "max_words", args.max_words)),
                jnp.int32,
            ),
        )["params"]
        if clip_text_params is not None:
            from temporalalignnet_tpu.checkpoint import neq_merge

            params, report = neq_merge(
                jax.device_get(params), {"lang_model": clip_text_params}
            )
            for line in report:
                print(f"[baseline] {line}")
        if use_proj:
            from temporalalignnet_tpu.checkpoint import (
                load_milnce_checkpoint,
                neq_merge,
            )

            loaded = load_milnce_checkpoint(args.milnce_ckpt)
            graft = {}
            if loaded["text_params"]:
                graft["lang_model"] = loaded["text_params"]
            if "fc" in loaded["params"]:
                graft["visual_proj"] = loaded["params"]["fc"]
            params, report = neq_merge(jax.device_get(params), graft)
            for line in report:
                print(f"[baseline] {line}")
    else:
        mcfg = ModelConfig(
            width=args.width,
            heads=args.heads,
            num_encoder_layers=args.num_encoder_layers,
            num_joint_layers=args.num_joint_layers,
            video_embed_dim=args.video_embed_dim,
            language_model=args.language_model,
            use_alignability_head=bool(args.use_alignability_head),
            random_pos_start=False,
        )
        # auto resolves OFF: task=align runs the corpus canvas (pallas
        # measured 5.8 vs 5.1 s — not attention-bound) and task=retrieval
        # never reaches the >= 512 window batches where the kernel wins;
        # keying auto on --batch_windows here silently regressed the canvas
        use_pallas = args.use_pallas == "1"
        model = TANWithText(mcfg, vocab_size=tokenizer.vocab_size, dtype=dtype,
                            bert_config=bert_config, use_pallas=use_pallas)
    init_params = None if baseline else model.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, args.video_embed_dim)),
        jnp.zeros((1, 2, args.max_words), jnp.int32),
        deterministic=True,
    )["params"]

    if baseline:
        pass  # params built above
    elif args.ckpt.endswith((".pth.tar", ".pth", ".tar")):
        from temporalalignnet_tpu.checkpoint import load_reference_checkpoint

        params = load_reference_checkpoint(args.ckpt)["params"]
    else:
        from temporalalignnet_tpu.checkpoint import load_params

        params = load_params(
            args.ckpt, jax.tree_util.tree_map(np.zeros_like, init_params)
        )

    cfg = EvalConfig(
        seq_len=args.seq_len,
        method=args.method,
        use_alignability_head=mcfg.use_alignability_head,
        num_clips=args.num_clips,
        batch_windows=args.batch_windows,
        global_buckets=args.global_buckets,
    )
    mesh = None
    if args.shard_eval and jax.device_count() > 1:
        from temporalalignnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(-1, 1)
    # the CLIP tokenizer emits fixed 77-token rows (EOT-terminated); the
    # datasets must pad/truncate to ITS width, not word2vec's 32
    ds_words = getattr(tokenizer, "max_words", args.max_words)
    if args.task == "align":
        ds = HTMAlignDataset(args.features, args.anno, tokenizer, ds_words)
        out = AlignmentEvaluator(model, params, cfg, mesh=mesh).evaluate(list(ds))
    else:
        ds = YC2RetrievalDataset(args.features, args.anno, "val", tokenizer, ds_words)
        out = RetrievalEvaluator(model, params, cfg, mesh=mesh).evaluate(list(ds))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
