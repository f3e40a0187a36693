"""AOT-export the zero-shot eval forward for serving (jax.export).

The reference deploys eval by shipping the Python model code and a torch
checkpoint (eval/eval_zeroshot_align.py builds the net in-process).  The
TPU-native serving story is ahead-of-time export: trace + lower the fused
eval forward (text encoding -> dual/joint encoders -> per-layer sims +
alignability head, the same program bench.py times) ONCE into a serialized
StableHLO artifact.  A serving process then needs only

    exported = jax.export.deserialize(blob)
    out = exported.call(params, video, input_ids)

— no model classes, no flax, no re-tracing; XLA compiles the artifact for
whatever chip it lands on.  Params stay a call argument (load them from
orbax next to the artifact) so one artifact serves every checkpoint of the
same architecture.

Batch handling: by default the artifact is specialized to a fixed window
batch B (fastest; serving pads the tail batch).  ``--poly_batch`` exports
with a symbolic batch dimension instead — one artifact, any B — using
jax.export shape polymorphism.

CLI:
    python -m temporalalignnet_tpu.tools.export_eval \
        --ckpt cotrain_word2vec_htm-370k_len64_e6d6.pth.tar \
        --out tan_eval.stablehlo --batch 192 [--poly_batch]

Round-trip verification (deserialize + run + compare against the live
model) happens before the file is written.
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Optional, Sequence

import numpy as np


def export_eval_forward(
    model: Any,
    params: Dict[str, Any],
    batch: int,
    seq_len: int = 64,
    feature_dim: int = 1024,
    sentences: int = 8,
    words: int = 32,
    poly_batch: bool = False,
    platforms: Optional[Sequence[str]] = None,
):
    """Trace the fused eval forward into a jax.export.Exported.

    Returns the Exported object (call .serialize() for bytes).  ``model`` is
    a TANWithText; the traced program is encode_text + text_visual_sims —
    the per-window work of the reference's overlap-seq eval
    (eval/eval_zeroshot_align.py:127-205) as one XLA program.
    """
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.models.net import TANWithText

    def fwd(params, video, input_ids):
        attention_mask = (input_ids != 0).astype(jnp.int32)
        text = model.apply(
            {"params": params}, input_ids, attention_mask,
            method=TANWithText.encode_text,
        )
        return model.apply(
            {"params": params}, video, text,
            method=TANWithText.text_visual_sims,
        )

    if poly_batch:
        scope = jax.export.SymbolicScope()
        (b,) = jax.export.symbolic_shape("b", scope=scope)
        video_spec = jax.ShapeDtypeStruct((b, seq_len, feature_dim), jnp.float32)
        ids_spec = jax.ShapeDtypeStruct((b, sentences, words), jnp.int32)
    else:
        video_spec = jax.ShapeDtypeStruct(
            (batch, seq_len, feature_dim), jnp.float32
        )
        ids_spec = jax.ShapeDtypeStruct((batch, sentences, words), jnp.int32)

    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params
    )
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    return jax.export.export(jax.jit(fwd), **kwargs)(
        params_spec, video_spec, ids_spec
    )


def roundtrip_check(
    blob: bytes,
    model: Any,
    params: Dict[str, Any],
    batch: int,
    seq_len: int,
    feature_dim: int,
    sentences: int,
    words: int,
    atol: float = 0.0,
) -> Dict[str, float]:
    """Deserialize ``blob``, run it, and compare against the live model."""
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.models.net import TANWithText

    exported = jax.export.deserialize(bytearray(blob))
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(batch, seq_len, feature_dim), jnp.float32)
    ids = jnp.asarray(rng.randint(1, 50, (batch, sentences, words)), jnp.int32)

    got = exported.call(params, video, ids)

    @jax.jit  # jitted so 'want' is the same fused program the export traced
    def ref(params, video, ids):
        mask = (ids != 0).astype(jnp.int32)
        text = model.apply({"params": params}, ids, mask,
                           method=TANWithText.encode_text)
        return model.apply({"params": params}, video, text,
                           method=TANWithText.text_visual_sims)

    want = ref(params, video, ids)
    diffs = {}
    for key in want:
        d = float(np.abs(np.asarray(got[key], np.float32)
                         - np.asarray(want[key], np.float32)).max())
        diffs[f"max_abs_diff/{key}"] = d
        if d > atol:
            raise AssertionError(
                f"round-trip mismatch on {key}: {d} > {atol}"
            )
    return diffs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None,
                   help="released .pth.tar (torch) to convert and bake the "
                        "architecture from; omit for random-init E6D6 "
                        "(artifact structure identical)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch", type=int, default=192,
                   help="window batch the artifact is specialized to "
                        "(ignored for tracing when --poly_batch)")
    p.add_argument("--poly_batch", action="store_true",
                   help="export with a symbolic batch dimension")
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--video_embed_dim", type=int, default=1024)
    p.add_argument("--sentences", type=int, default=8)
    p.add_argument("--words", type=int, default=32)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms (e.g. tpu,cpu); "
                        "default = current backend only")
    p.add_argument("--verify_batch", type=int, default=4,
                   help="round-trip check batch (poly artifacts verify at "
                        "this size; fixed artifacts verify at --batch)")
    # architecture overrides (defaults = the released E6D6 flagship)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--vocab_size", type=int, default=66251)
    return p


def main(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.core.config import ModelConfig
    from temporalalignnet_tpu.models.net import TANWithText

    args = build_parser().parse_args(argv)
    cfg = ModelConfig(use_alignability_head=True,
                      video_embed_dim=args.video_embed_dim,
                      width=args.width, heads=args.heads,
                      num_encoder_layers=args.layers,
                      num_joint_layers=args.layers,
                      random_pos_start=False)
    model = TANWithText(cfg, vocab_size=args.vocab_size, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    init_video = jnp.asarray(
        rng.randn(2, args.seq_len, args.video_embed_dim), jnp.float32
    )
    init_ids = jnp.zeros((2, args.sentences, args.words), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        init_video, init_ids, deterministic=True,
    )["params"]
    if args.ckpt:
        from temporalalignnet_tpu.checkpoint import (
            load_reference_checkpoint,
            neq_merge,
        )

        loaded = load_reference_checkpoint(args.ckpt)
        params, report = neq_merge(jax.device_get(params), loaded["params"])
        for line in report:
            print(f"[export] {line}")

    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_eval_forward(
        model, params, args.batch, args.seq_len, args.video_embed_dim,
        args.sentences, args.words, poly_batch=args.poly_batch,
        platforms=platforms,
    )
    blob = exported.serialize()
    vb = args.verify_batch if args.poly_batch else args.batch
    diffs = roundtrip_check(
        blob, model, params, vb, args.seq_len, args.video_embed_dim,
        args.sentences, args.words,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    out = {
        "path": args.out,
        "bytes": len(blob),
        "platforms": list(exported.platforms),
        "poly_batch": bool(args.poly_batch),
        **diffs,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
