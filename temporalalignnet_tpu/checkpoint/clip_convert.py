"""HF CLIP checkpoints -> flax CLIP towers (vision and text).

Completes the htm_zoo backbone story (reference
htm_zoo/visual/extract_feature_template.py:236-307 wraps torch CLIP;
htm_zoo/readme.md:17-28 releases B/32 and L/14 HTM features): any HF
CLIPVisionModel / CLIPVisionModelWithProjection state_dict (or a full CLIPModel
one) converts to the flax tower in models/clip_vit.py.

Key mapping (standard torch->flax leaf conventions, as torch_convert.py):
- vision_model.embeddings.patch_embedding.weight [D,3,p,p] -> patch_embed/kernel
  [p,p,3,D] (conv HWIO transpose);
- class_embedding / position_embedding.weight -> same-named params;
- pre_layrnorm (HF's own typo) / post_layernorm -> ln_pre / ln_post;
- encoder.layers.{i}.self_attn.{q,k,v,out}_proj -> resblocks_{i}/attn/*
  (kernels transposed);
- .layer_norm1/2 -> ln_1/ln_2; .mlp.fc1/fc2 -> mlp/c_fc,c_proj;
- visual_projection.weight [E, D] -> proj/kernel [D, E].

The state_dict carries no activation info: build the flax tower with
``CLIPImageEncoder(hidden_act=config.hidden_act)`` — OpenAI releases use
'quick_gelu' (the default) but LAION/OpenCLIP HF exports use 'gelu', and a
mismatch converts cleanly yet produces wrong activations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from temporalalignnet_tpu.checkpoint.torch_convert import _set, _to_numpy


def _encoder_layer(params, base, rest, v, key, report) -> None:
    """HF CLIPEncoderLayer leaf -> resblocks_{i} subtree (shared by the
    vision and text converters: self_attn/layer_norm1,2/mlp.fc1,fc2)."""
    if rest[0] == "self_attn":
        name = "kernel" if rest[2] == "weight" else "bias"
        _set(params, base + ["attn", rest[1], name],
             v.T if name == "kernel" else v)
    elif rest[0] in ("layer_norm1", "layer_norm2"):
        ln = "ln_1" if rest[0] == "layer_norm1" else "ln_2"
        name = "scale" if rest[1] == "weight" else "bias"
        _set(params, base + [ln, name], v)
    elif rest[0] == "mlp":
        fc = "c_fc" if rest[1] == "fc1" else "c_proj"
        name = "kernel" if rest[2] == "weight" else "bias"
        _set(params, base + ["mlp", fc, name],
             v.T if name == "kernel" else v)
    elif report is not None:
        report.append(f"unrecognized clip key: {key}")


def clip_vision_torch_to_params(
    state_dict: Dict[str, Any], report: Optional[List[str]] = None
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "text_model" or key.startswith("text_projection") or (
            key in ("logit_scale",)
        ):
            continue  # full-CLIPModel checkpoints: image tower only
        if parts[0] == "visual_projection":
            _set(params, ["proj", "kernel"], v.T)
            continue
        if parts[0] == "vision_model":
            parts = parts[1:]
        if parts[0] == "embeddings":
            if parts[1] == "patch_embedding":
                _set(params, ["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
            elif parts[1] == "class_embedding":
                _set(params, ["class_embedding"], v.reshape(-1))
            elif parts[1] == "position_embedding" and parts[-1] == "weight":
                _set(params, ["position_embedding"], v)
            elif parts[-1] == "position_ids":
                pass  # registered buffer
            elif report is not None:
                report.append(f"unrecognized clip key: {key}")
        elif parts[0] in ("pre_layrnorm", "pre_layernorm", "post_layernorm"):
            name = "scale" if parts[1] == "weight" else "bias"
            target = "ln_pre" if parts[0].startswith("pre") else "ln_post"
            _set(params, [target, name], v)
        elif parts[0] == "encoder" and parts[1] == "layers":
            _encoder_layer(
                params, [f"resblocks_{parts[2]}"], parts[3:], v, key, report
            )
        elif report is not None:
            report.append(f"unrecognized clip key: {key}")
    return params


def clip_text_torch_to_params(
    state_dict: Dict[str, Any], report: Optional[List[str]] = None
) -> Dict[str, Any]:
    """HF CLIPTextModel(/WithProjection) (or full CLIPModel) state_dict ->
    models/clip_text.py::CLIPTextEncoder param tree.

    Same leaf conventions as the vision converter, plus:
    - text_model.embeddings.token_embedding.weight -> token_embedding/embedding;
    - .position_embedding.weight -> positional_embedding;
    - text_model.final_layer_norm -> ln_final;
    - text_projection.weight [E, D] -> proj/kernel [D, E].

    As with the vision tower, set hidden_act (and eos_token_id for the HF
    pooling semantics) on the flax module from the checkpoint's config — the
    state_dict carries neither.
    """
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "vision_model" or key.startswith("visual_projection") or (
            key in ("logit_scale",)
        ):
            continue  # full-CLIPModel checkpoints: text tower only
        if parts[0] == "text_projection":
            _set(params, ["proj", "kernel"], v.T)
            continue
        if parts[0] == "text_model":
            parts = parts[1:]
        if parts[0] == "embeddings":
            if parts[1] == "token_embedding":
                _set(params, ["token_embedding", "embedding"], v)
            elif parts[1] == "position_embedding" and parts[-1] == "weight":
                _set(params, ["positional_embedding"], v)
            elif parts[-1] == "position_ids":
                pass  # registered buffer
            elif report is not None:
                report.append(f"unrecognized clip key: {key}")
        elif parts[0] == "final_layer_norm":
            name = "scale" if parts[1] == "weight" else "bias"
            _set(params, ["ln_final", name], v)
        elif parts[0] == "encoder" and parts[1] == "layers":
            _encoder_layer(
                params, [f"resblocks_{parts[2]}"], parts[3:], v, key, report
            )
        elif report is not None:
            report.append(f"unrecognized clip key: {key}")
    return params
