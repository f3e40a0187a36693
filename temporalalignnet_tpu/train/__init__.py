from temporalalignnet_tpu.train.optimizer import (
    make_optimizer,
    cosine_warmup_schedule,
)
from temporalalignnet_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_batch,
)

__all__ = [
    "make_optimizer",
    "cosine_warmup_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "shard_batch",
]
