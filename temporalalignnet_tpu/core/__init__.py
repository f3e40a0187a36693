from temporalalignnet_tpu.core.config import (
    ModelConfig,
    LossConfig,
    TrainConfig,
    DataConfig,
    EvalConfig,
)
from temporalalignnet_tpu.core.precision import Precision

__all__ = [
    "ModelConfig",
    "LossConfig",
    "TrainConfig",
    "DataConfig",
    "EvalConfig",
    "Precision",
]
