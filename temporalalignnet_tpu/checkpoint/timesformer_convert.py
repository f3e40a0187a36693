"""HF TimeSformer checkpoint -> TimeSformerEncoder param tree.

Completes the htm_zoo video-transformer backbone slot (the reference
extractor's ``timesformer`` branch,
/root/reference/htm_zoo/visual/extract_feature_template.py:266-269): any HF
``TimesformerModel`` or ``TimesformerForVideoClassification`` state_dict
(``timesformer.``-prefixed, classifier head skipped) converts to the flax
tower in models/timesformer.py.

Key mapping (standard torch->flax leaf conventions, as torch_convert.py):
- embeddings.patch_embeddings.projection.{weight [D,3,p,p], bias} ->
  patch_embed/{kernel [p,p,3,D] HWIO transpose, bias};
- embeddings.cls_token [1,1,D] / position_embeddings [1,P+1,D] /
  time_embeddings [1,T,D] -> cls_token [D] / position_embedding [P+1,D] /
  time_embedding [T,D];
- encoder.layer.{i}.temporal_layernorm -> layers_{i}/temporal_ln;
  .temporal_attention.attention.qkv / .output.dense ->
  temporal_attn/{qkv,proj}; .temporal_dense -> temporal_dense;
- .layernorm_before/.attention.* -> ln_before / attn/{qkv,proj};
- .layernorm_after / .intermediate.dense / .output.dense ->
  ln_after / c_fc / c_proj  (kernels transposed);
- layernorm.{weight,bias} (final) -> ln_post.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from temporalalignnet_tpu.checkpoint.torch_convert import _set, _to_numpy

_ATTN = {"qkv": "qkv", "dense": "proj"}


def _dense(params, path: List[str], leaf: str, v) -> None:
    if leaf == "weight":
        _set(params, path + ["kernel"], v.T)
    else:
        _set(params, path + ["bias"], v)


def _ln(params, path: List[str], leaf: str, v) -> None:
    _set(params, path + ["scale" if leaf == "weight" else "bias"], v)


def timesformer_torch_to_params(
    state_dict: Dict[str, Any], report: Optional[List[str]] = None
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "timesformer":  # ForVideoClassification prefix
            parts = parts[1:]
        if parts[0] == "classifier":
            continue
        if parts[0] == "embeddings":
            if parts[1] == "patch_embeddings":  # projection conv
                if parts[-1] == "weight":
                    _set(params, ["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
                else:
                    _set(params, ["patch_embed", "bias"], v)
            elif parts[1] == "cls_token":
                _set(params, ["cls_token"], v.reshape(-1))
            elif parts[1] == "position_embeddings":
                _set(params, ["position_embedding"], v[0])
            elif parts[1] == "time_embeddings":
                _set(params, ["time_embedding"], v[0])
            elif report is not None:
                report.append(f"unrecognized timesformer key: {key}")
        elif parts[0] == "encoder" and parts[1] == "layer":
            i, rest = parts[2], parts[3:]
            base = [f"layers_{i}"]
            if rest[0] in ("temporal_attention", "attention") and (
                len(rest) == 4 and rest[2] in _ATTN
            ):
                tgt = "temporal_attn" if rest[0].startswith("temporal") else "attn"
                # .attention.qkv.* / .output.dense.*
                _dense(params, base + [tgt, _ATTN[rest[2]]], rest[3], v)
            elif rest[0] == "temporal_layernorm":
                _ln(params, base + ["temporal_ln"], rest[1], v)
            elif rest[0] == "temporal_dense":
                _dense(params, base + ["temporal_dense"], rest[1], v)
            elif rest[0] in ("layernorm_before", "layernorm_after"):
                _ln(params, base + ["ln_" + rest[0].split("_")[1]], rest[1], v)
            elif rest[0] == "intermediate":
                _dense(params, base + ["c_fc"], rest[2], v)
            elif rest[0] == "output":
                _dense(params, base + ["c_proj"], rest[2], v)
            elif report is not None:
                report.append(f"unrecognized timesformer key: {key}")
        elif parts[0] == "layernorm":
            _ln(params, ["ln_post"], parts[1], v)
        elif report is not None:
            report.append(f"unrecognized timesformer key: {key}")
    return params
