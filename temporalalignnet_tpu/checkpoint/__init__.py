from temporalalignnet_tpu.checkpoint.orbax_io import (
    Checkpointer,
    load_params,
    save_params,
)
from temporalalignnet_tpu.checkpoint.clip_convert import (
    clip_text_torch_to_params,
    clip_vision_torch_to_params,
)
from temporalalignnet_tpu.checkpoint.s3d_convert import (
    load_milnce_checkpoint,
    s3d_torch_to_variables,
)
from temporalalignnet_tpu.checkpoint.timesformer_convert import (
    timesformer_torch_to_params,
)
from temporalalignnet_tpu.checkpoint.torch_convert import (
    diff_param_trees,
    flax_to_torch_state,
    load_reference_checkpoint,
    neq_merge,
    params_to_torch,
    save_reference_checkpoint,
    split_twin_state_dict,
    stage1_to_stage2,
    torch_to_params,
)

__all__ = [
    "clip_text_torch_to_params",
    "clip_vision_torch_to_params",
    "timesformer_torch_to_params",
    "Checkpointer",
    "load_params",
    "save_params",
    "diff_param_trees",
    "flax_to_torch_state",
    "load_reference_checkpoint",
    "neq_merge",
    "save_reference_checkpoint",
    "load_milnce_checkpoint",
    "s3d_torch_to_variables",
    "params_to_torch",
    "split_twin_state_dict",
    "stage1_to_stage2",
    "torch_to_params",
]
