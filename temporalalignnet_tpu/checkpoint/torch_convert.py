"""Torch checkpoint <-> JAX pytree converter.

The parity anchor (SURVEY §5 "Checkpoint / resume"): the released
``cotrain_word2vec_htm-370k_len64_e6d6.pth.tar`` (reference readme.md:45) stores a
flat dict ``{epoch, state_dict, best_acc, optimizer, iteration}`` whose state_dict
keys follow torch module naming (reference model/tan_model.py:13-97).  This module
maps that key space onto the TANWithText flax param tree and back.

Conversion rules:
- torch ``nn.Linear`` stores ``weight [out, in]``; flax Dense kernel is [in, out]
  -> transpose.
- torch ``nn.MultiheadAttention`` packs QKV as ``in_proj_weight [3D, D]`` /
  ``in_proj_bias [3D]`` (init at tan_model.py:89); flax uses separate
  q_proj/k_proj/v_proj -> split rows into thirds, transpose each.
- torch LayerNorm ``weight`` -> flax ``scale``.
- ``bert.*`` maps to ``lang_model.*`` — the reference names its language model
  ``self.bert`` even for word2vec (tan_model.py:38-40) while the trainer calls it
  ``model.lang_model`` (the §2.9 API skew); both spellings are accepted.
- Stage-2 twin checkpoints use ``online.*`` / ``target.*`` key spaces
  (tan_model.py:315-351, train/main.py:463-484): ``online`` -> params,
  ``target`` -> ema_params.
- the reference's unused ``self.mlp`` Linear (tan_model.py:68) is dropped.

Mismatches are collected and reported, mirroring ``neq_load_customized``'s key-diff
printout (reference utils/utils.py:302-312), instead of failing hard.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# torch-module attribute -> flax param-collection naming
_LN = ("ln_1", "ln_2", "ln_text_init", "ln_video_init", "ln_position_init",
       "ln_video_post_enc", "ln_joint_post_enc")

_DROPPED = re.compile(r"^(mlp\.(weight|bias)|logit_scale|entropy_scale)$")


def _set(tree: Dict[str, Any], path: List[str], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _get(tree: Dict[str, Any], path: List[str]):
    node = tree
    for k in path:
        node = node[k]
    return node


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _hf_bert_to_flax(params: Dict[str, Any], sub: List[str], v: np.ndarray,
                     report: Optional[List[str]]):
    """One ``bert.{embeddings|encoder|pooler}.*`` torch key -> the
    ``lang_model/bert/...`` FlaxBertModule leaf.

    HF's torch and flax BERTs share the module path layout; only the leaf
    conventions differ: Linear ``weight [out, in]`` -> ``kernel`` transposed,
    LayerNorm ``weight`` -> ``scale``, ``*_embeddings.weight`` ->
    ``embedding`` (no transpose).  The ``position_ids`` registered buffer is
    not a parameter and is dropped."""
    if sub[-1] == "position_ids":
        return
    leaf = sub[-1]
    path = list(sub[:-1])
    if leaf == "weight":
        parent = path[-1]
        if parent.endswith("_embeddings"):
            name, vv = "embedding", v
        elif parent == "LayerNorm":
            name, vv = "scale", v
        else:  # dense / query / key / value projections
            name, vv = "kernel", v.T
        _set(params, ["lang_model", "bert"] + path + [name], vv)
    elif leaf == "bias":
        _set(params, ["lang_model", "bert"] + path + ["bias"], v)
    elif report is not None:
        report.append(f"unrecognized bert key: {'.'.join(sub)}")


def torch_to_params(
    state_dict: Dict[str, Any], report: Optional[List[str]] = None
) -> Dict[str, Any]:
    """Convert one TemporalAligner torch state_dict to a TANWithText param tree.

    ``report`` (if given) collects human-readable notes about dropped keys.
    """
    params: Dict[str, Any] = {}
    pending_qkv: Dict[str, Dict[str, np.ndarray]] = {}

    for key, value in state_dict.items():
        v = _to_numpy(value)
        if _DROPPED.match(key):
            if report is not None:
                report.append(f"dropped (unused in reference forward): {key}")
            continue

        parts = key.split(".")
        # bert.* / lang_model.* -> lang_model.*  (§2.9 skew: both accepted)
        if parts[0] in ("bert", "lang_model"):
            sub = parts[1:]
            if sub[0] == "word_embd" and sub[1] == "weight":
                _set(params, ["lang_model", "word_embd", "embedding"], v)
            elif sub[0] in ("fc1", "fc2"):
                name = "kernel" if sub[1] == "weight" else "bias"
                _set(params, ["lang_model", sub[0], name], v.T if name == "kernel" else v)
            elif sub[0] in ("embeddings", "encoder", "pooler"):
                # a REAL HF BertModel under self.bert (tan_model.py:37-38,
                # language_model='bert') -> the FlaxBertModule tree under
                # lang_model/bert (models/net.py::BertEncoder)
                _hf_bert_to_flax(params, sub, v, report)
            elif report is not None:
                report.append(f"unrecognized language-model key: {key}")
            continue

        # everything else lives under aligner/
        if parts[0] in ("video_temporal_encoder", "joint_temporal_encoder"):
            enc, _, idx = parts[0], parts[1], parts[2]  # resblocks.{i}
            block = f"resblocks_{idx}"
            rest = parts[3:]
            base = ["aligner", enc, block]
            if rest[0] == "attn":
                if rest[1] in ("in_proj_weight", "in_proj_bias"):
                    pending_qkv.setdefault(".".join([enc, block]), {})[rest[1]] = v
                elif rest[1] == "out_proj":
                    name = "kernel" if rest[2] == "weight" else "bias"
                    _set(params, base + ["attn", "out_proj", name],
                         v.T if name == "kernel" else v)
                elif report is not None:
                    report.append(f"unrecognized attention key: {key}")
            elif rest[0] in ("ln_1", "ln_2"):
                name = "scale" if rest[1] == "weight" else "bias"
                _set(params, base + [rest[0], name], v)
            elif rest[0] == "mlp":
                name = "kernel" if rest[2] == "weight" else "bias"
                _set(params, base + ["mlp", rest[1], name], v.T if name == "kernel" else v)
            elif report is not None:
                report.append(f"unrecognized encoder key: {key}")
            continue

        if parts[0] in ("video_pre_proj", "text_pre_proj", "binary_head"):
            name = "kernel" if parts[1] == "weight" else "bias"
            _set(params, ["aligner", parts[0], name], v.T if name == "kernel" else v)
        elif parts[0] in _LN:
            name = "scale" if parts[1] == "weight" else "bias"
            _set(params, ["aligner", parts[0], name], v)
        elif parts[0] in ("temporal_pos_embed", "text_temporal_pos_embed"):
            _set(params, ["aligner", parts[0]], v)
        elif report is not None:
            report.append(f"unrecognized key: {key}")

    # split packed QKV (tan_model.py:89; torch packs rows [q; k; v])
    for enc_block, packed in pending_qkv.items():
        enc, block = enc_block.split(".")
        base = ["aligner", enc, block, "attn"]
        w = packed.get("in_proj_weight")
        b = packed.get("in_proj_bias")
        d = w.shape[1]
        for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, base + [proj, "kernel"], w[i * d : (i + 1) * d].T.copy())
            if b is not None:
                _set(params, base + [proj, "bias"], b[i * d : (i + 1) * d].copy())
    return params


def _flax_bert_to_torch(
    tree: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str
) -> None:
    """Inverse of :func:`_hf_bert_to_flax`: walk the FlaxBertModule param tree
    (HF torch and flax BERTs share module paths) and emit torch dotted keys —
    ``kernel`` -> ``weight`` transposed, ``scale``/``embedding`` -> ``weight``
    as-is, ``bias`` -> ``bias``.  (torch's non-persistent ``position_ids``
    buffer is not a parameter and is not emitted.)"""
    for k, v in tree.items():
        if isinstance(v, dict):
            _flax_bert_to_torch(v, out, f"{prefix}{k}.")
        elif k == "kernel":
            out[f"{prefix}weight"] = np.asarray(v).T
        elif k in ("scale", "embedding"):
            out[f"{prefix}weight"] = np.asarray(v)
        else:  # bias
            out[f"{prefix}{k}"] = np.asarray(v)


def params_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_to_params` (numpy arrays; caller wraps in tensors).

    Useful for exporting a TPU-trained model back to the reference eco-system and
    for round-trip testing the converter.
    """
    out: Dict[str, np.ndarray] = {}
    lang = params.get("lang_model", {})
    if "bert" in lang:
        # language_model='bert': a FlaxBertModule tree under lang_model/bert
        # -> the genuine HF ``bert.embeddings/encoder/pooler.*`` key space
        # (tan_model.py:37-38)
        _flax_bert_to_torch(lang["bert"], out, "bert.")
    elif lang:
        out["bert.word_embd.weight"] = np.asarray(lang["word_embd"]["embedding"])
        for fc in ("fc1", "fc2"):
            out[f"bert.{fc}.weight"] = np.asarray(lang[fc]["kernel"]).T
            out[f"bert.{fc}.bias"] = np.asarray(lang[fc]["bias"])

    al = params.get("aligner", {})
    for proj in ("video_pre_proj", "text_pre_proj"):
        if proj in al:
            out[f"{proj}.weight"] = np.asarray(al[proj]["kernel"]).T
    if "binary_head" in al:
        out["binary_head.weight"] = np.asarray(al["binary_head"]["kernel"]).T
        out["binary_head.bias"] = np.asarray(al["binary_head"]["bias"])
    for ln in _LN[2:]:  # model-level LNs
        if ln in al:
            out[f"{ln}.weight"] = np.asarray(al[ln]["scale"])
            out[f"{ln}.bias"] = np.asarray(al[ln]["bias"])
    for tbl in ("temporal_pos_embed", "text_temporal_pos_embed"):
        if tbl in al:
            out[tbl] = np.asarray(al[tbl])

    for enc in ("video_temporal_encoder", "joint_temporal_encoder"):
        blocks = sorted(
            (k for k in al.get(enc, {}) if k.startswith("resblocks_")),
            key=lambda s: int(s.split("_")[1]),
        )
        for bname in blocks:
            i = bname.split("_")[1]
            blk = al[enc][bname]
            pre = f"{enc}.resblocks.{i}"
            qkv_w = np.concatenate(
                [np.asarray(blk["attn"][p]["kernel"]).T for p in ("q_proj", "k_proj", "v_proj")],
                axis=0,
            )
            out[f"{pre}.attn.in_proj_weight"] = qkv_w
            if "bias" in blk["attn"]["q_proj"]:
                out[f"{pre}.attn.in_proj_bias"] = np.concatenate(
                    [np.asarray(blk["attn"][p]["bias"]) for p in ("q_proj", "k_proj", "v_proj")]
                )
            out[f"{pre}.attn.out_proj.weight"] = np.asarray(blk["attn"]["out_proj"]["kernel"]).T
            out[f"{pre}.attn.out_proj.bias"] = np.asarray(blk["attn"]["out_proj"]["bias"])
            for ln in ("ln_1", "ln_2"):
                out[f"{pre}.{ln}.weight"] = np.asarray(blk[ln]["scale"])
                out[f"{pre}.{ln}.bias"] = np.asarray(blk[ln]["bias"])
            for fc in ("c_fc", "c_proj"):
                out[f"{pre}.mlp.{fc}.weight"] = np.asarray(blk["mlp"][fc]["kernel"]).T
                out[f"{pre}.mlp.{fc}.bias"] = np.asarray(blk["mlp"][fc]["bias"])
    return out


def flax_to_torch_state(
    params: Dict[str, Any], ema_params: Optional[Dict[str, Any]] = None
) -> Dict[str, np.ndarray]:
    """Full reverse converter: a TANWithText param tree (+ optional EMA tree)
    -> the torch ``state_dict`` key space the reference saves.

    Stage-1 (``ema_params=None``): plain TemporalAligner keys — the inverse of
    every :func:`torch_to_params` rule (QKV kernels re-packed into
    ``in_proj_weight`` rows [q; k; v], Dense kernels transposed back to
    ``weight [out, in]``, LayerNorm ``scale`` -> ``weight``).

    Stage-2: the TwinTemporalAligner key space (reference tan_model.py:315-323)
    — ``online.*`` from ``params``, ``target.*`` from ``ema_params``, plus the
    module-level ``bert.*`` alias keys that torch's state_dict emits because
    the twin registers ``self.bert = self.online.bert`` (tan_model.py:323), so
    a strict ``load_state_dict`` into the reference twin module succeeds.

    The reference's unused ``self.mlp`` Linear and ``logit_scale`` /
    ``entropy_scale`` scalars (dropped on import — they never enter the
    forward, tan_model.py:68) have no flax-side values and are NOT emitted;
    the reference loads checkpoints through ``neq_load_customized``
    (utils/utils.py:302-312), which keeps its fresh init for them.
    """
    online = params_to_torch(params)
    if ema_params is None:
        return online
    target = params_to_torch(ema_params)
    out = {f"online.{k}": v for k, v in online.items()}
    out.update({f"target.{k}": v for k, v in target.items()})
    # the twin's bert alias shares the ONLINE tensors (same module object)
    out.update({k: v for k, v in online.items() if k.startswith("bert.")})
    return out


def save_reference_checkpoint(
    path: str,
    params: Dict[str, Any],
    ema_params: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    iteration: int = 0,
    best_acc: float = 0.0,
    optimizer: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a reference-format ``.pth.tar`` checkpoint the upstream tooling
    consumes: the flat dict ``{epoch, state_dict, best_acc, optimizer,
    iteration}`` (reference utils/utils.py:39-57, train/main.py:146-151),
    tensors as torch CPU tensors.

    ``optimizer`` passes through verbatim (a torch ``optimizer.state_dict()``
    if the caller has one); optax state is not translated — torch-side RESUME
    re-inits its optimizer, while eval harnesses ignore the field entirely.
    """
    import torch

    def to_tensor(v: np.ndarray) -> "torch.Tensor":
        v = np.ascontiguousarray(v)
        if v.dtype.name == "bfloat16":  # ml_dtypes bf16 has no torch bridge
            # reference checkpoints are f32; upcast (exact — bf16 ⊂ f32)
            v = v.astype(np.float32)
        if not v.flags.writeable:  # torch.from_numpy rejects frozen views
            v = v.copy()
        return torch.from_numpy(v)

    sd = {
        k: to_tensor(v) for k, v in flax_to_torch_state(params, ema_params).items()
    }
    torch.save(
        {
            "epoch": int(epoch),
            "state_dict": sd,
            "best_acc": float(best_acc),
            "optimizer": optimizer if optimizer is not None else {},
            "iteration": int(iteration),
        },
        path,
    )


def split_twin_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """Split a TwinTemporalAligner state_dict into (online, target) halves.

    Plain Stage-1 checkpoints pass through as (state_dict, None).  The twin's
    module-level ``bert.*`` alias keys (tan_model.py:323) are folded into the
    online half.
    """
    online, target = {}, {}
    twin = False
    for k, v in state_dict.items():
        if k.startswith("online."):
            online[k[len("online."):]] = v
            twin = True
        elif k.startswith("target."):
            target[k[len("target."):]] = v
            twin = True
        else:
            online[k] = v
    if not twin:
        return online, None
    return online, target


def load_reference_checkpoint(
    path: str, verbose: bool = True
) -> Dict[str, Any]:
    """Load a reference ``.pth.tar`` and return
    ``{params, ema_params, epoch, iteration, best_acc, report}``.

    Handles both plain (Stage-1) and twin (Stage-2) key spaces.  Requires torch
    (CPU) only for deserialization.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    online_sd, target_sd = split_twin_state_dict(state_dict)
    report: List[str] = []
    params = torch_to_params(online_sd, report)
    ema = torch_to_params(target_sd, report) if target_sd else None
    if verbose and report:
        print("[torch_convert] " + "\n[torch_convert] ".join(report))
    return {
        "params": params,
        "ema_params": ema,
        "epoch": ckpt.get("epoch", 0),
        "iteration": ckpt.get("iteration", 0),
        "best_acc": ckpt.get("best_acc", 0.0),
        "report": report,
    }


def stage1_to_stage2(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Stage-1 pretrain -> Stage-2 cotrain init: duplicate params into
    (online, target=EMA copy), replacing the reference's key-space remap
    (train/main.py:463-484)."""
    import jax

    copy = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), params)
    return params, copy


def neq_merge(base: Dict[str, Any], loaded: Dict[str, Any]) -> Tuple[Dict[str, Any], List[str]]:
    """Non-strict parameter load (reference utils/utils.py:302-312 +
    train/main.py:458-484): copy leaves present in ``loaded`` onto ``base``,
    keep base's fresh init where missing (e.g. a new binary_head when
    pretraining Stage-2 from a Stage-1 checkpoint), report both diffs."""
    report: List[str] = []

    def walk(b, l, path):
        if not isinstance(b, dict):
            return l if l is not None else b
        out = {}
        for k, v in b.items():
            sub = l.get(k) if isinstance(l, dict) else None
            if sub is None:
                report.append(f"missing in checkpoint (kept init): {path}{k}")
                out[k] = v
            else:
                out[k] = walk(v, sub, f"{path}{k}/")
        if isinstance(l, dict):
            for k in l:
                if k not in b:
                    report.append(f"unexpected in checkpoint (dropped): {path}{k}")
        return out

    return walk(base, loaded, ""), report


def diff_param_trees(expected: Dict[str, Any], got: Dict[str, Any]) -> List[str]:
    """Non-strict-load style key diff (reference utils/utils.py:302-312):
    returns human-readable lines for missing / unexpected / shape-mismatched
    leaves."""
    import jax

    def flatten(tree):
        flat = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            flat[name] = np.asarray(leaf)
        return flat

    e, g = flatten(expected), flatten(got)
    lines = []
    for k in sorted(set(e) - set(g)):
        lines.append(f"missing: {k} {e[k].shape}")
    for k in sorted(set(g) - set(e)):
        lines.append(f"unexpected: {k} {g[k].shape}")
    for k in sorted(set(e) & set(g)):
        if e[k].shape != g[k].shape:
            lines.append(f"shape mismatch: {k} expected {e[k].shape} got {g[k].shape}")
    return lines
