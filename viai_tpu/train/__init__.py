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
    global_batch_from_local,
    make_mesh,
    maybe_initialize_distributed,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)
from .pool import init_pool, query_pool
from .schedules import adam, make_schedule, plateau_kwargs, plateau_scale

__all__ = [
    "TrainConfig", "init_state", "make_train_step", "make_infer_fn",
    "preprocess", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "shard_params", "adam", "make_schedule",
    "plateau_kwargs", "plateau_scale",
    "global_batch_from_local", "maybe_initialize_distributed",
    "init_pool", "query_pool",
]
