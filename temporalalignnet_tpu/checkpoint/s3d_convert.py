"""S3D (MIL-NCE) torch checkpoint -> Flax variables converter.

Maps the ``s3d_howto100m.pth`` key space (reference model/s3d_milnce/s3dg.py)
onto models/s3d.S3D's variables:
- Conv3d weight [O, I, kT, kH, kW] -> channel-last kernel [kT, kH, kW, I, O];
- BatchNorm3d weight/bias -> params .../{scale,bias}; running_mean/var ->
  batch_stats .../{mean,var}; ``num_batches_tracked`` dropped.  FrozenBN
  checkpoints that renamed ``.weight`` to ``.scale`` (end2end/main_nce.py:306-313)
  are accepted transparently;
- SelfGating / fc Linear weights transposed;
- ``text_module.*`` (Sentence_Embedding, s3dg.py:186-247) -> a Word2VecEncoder
  param tree (embed/fc1/fc2), returned separately.

The space-to-depth channel ordering ((t2, h2, w2, C), s3dg.py:312-318) matches
models/s3d.space_to_depth, so conv1 weights convert with a plain transpose.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict[str, Any], path: List[str], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def s3d_torch_to_variables(
    state_dict: Dict[str, Any], report: Optional[List[str]] = None
) -> Dict[str, Any]:
    """Returns {'params': ..., 'batch_stats': ..., 'text_params': ... or None}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    text: Dict[str, Any] = {}

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(value)
        parts = key.split(".")
        # strip torch DataParallel / wrapper prefixes
        while parts and parts[0] in ("module", "backbone", "s3d"):
            parts = parts[1:]

        if parts[0] == "text_module":
            sub, leaf = parts[1], parts[2]
            if sub == "word_embd":
                _set(text, ["word_embd", "embedding"], v)
            elif sub in ("fc1", "fc2"):
                _set(text, [sub, "kernel" if leaf == "weight" else "bias"],
                     v.T if leaf == "weight" else v)
            elif report is not None:
                report.append(f"unrecognized text key: {key}")
            continue

        leaf = parts[-1]
        mod = parts[-2]
        prefix = parts[:-2]

        if mod.startswith("conv") and leaf == "weight":
            # Conv3d [O, I, kT, kH, kW] -> [kT, kH, kW, I, O]
            _set(params, prefix + [mod, "kernel"], v.transpose(2, 3, 4, 1, 0))
        elif mod.startswith("bn"):
            if leaf in ("weight", "scale"):  # FrozenBN renames weight->scale
                _set(params, prefix + [mod, "scale"], v)
            elif leaf == "bias":
                _set(params, prefix + [mod, "bias"], v)
            elif leaf == "running_mean":
                _set(stats, prefix + [mod, "mean"], v)
            elif leaf == "running_var":
                _set(stats, prefix + [mod, "var"], v)
            elif report is not None:
                report.append(f"unrecognized bn key: {key}")
        elif mod == "fc" and leaf in ("weight", "bias"):
            _set(params, prefix + [mod, "kernel" if leaf == "weight" else "bias"],
                 v.T if leaf == "weight" else v)
        elif report is not None:
            report.append(f"unrecognized key: {key}")

    return {
        "params": params,
        "batch_stats": stats,
        "text_params": text or None,
    }


def load_milnce_checkpoint(path: str, verbose: bool = True) -> Dict[str, Any]:
    """Load the released s3d_howto100m.pth (or a fine-tuned end2end ckpt)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    report: List[str] = []
    out = s3d_torch_to_variables(state_dict, report)
    if verbose and report:
        print("[s3d_convert] " + "\n[s3d_convert] ".join(report))
    out["report"] = report
    return out
