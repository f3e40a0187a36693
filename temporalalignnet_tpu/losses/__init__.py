from temporalalignnet_tpu.losses.masked import (
    masked_mean,
    masked_std,
    masked_quantile,
)
from temporalalignnet_tpu.losses.agreement import agreement_self_labelling
from temporalalignnet_tpu.losses.tan_loss import get_loss, mask_from_time

__all__ = [
    "masked_mean",
    "masked_std",
    "masked_quantile",
    "agreement_self_labelling",
    "get_loss",
    "mask_from_time",
]
