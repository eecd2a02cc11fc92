"""Training layer (L4): GAN step, mesh/sharding, schedules."""

from .step import (
    TrainConfig,
    init_state,
    make_infer_fn,
    make_train_step,
    preprocess,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .schedules import adam, make_schedule

__all__ = [
    "TrainConfig", "init_state", "make_train_step", "make_infer_fn",
    "preprocess", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "adam", "make_schedule",
]
