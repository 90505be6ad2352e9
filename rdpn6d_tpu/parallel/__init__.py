"""SPMD mesh + train/eval steps (replaces the reference's DDP/NCCL stack)."""

from .mesh import (
    batch_sharding,
    create_mesh,
    gather_predictions,
    replicate,
    replicated,
    shard_batch,
)
from .train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_fused_sharded_train_step,
    make_sharded_train_step,
    make_train_step,
)

__all__ = [
    "batch_sharding", "create_mesh", "gather_predictions",
    "replicate", "replicated", "shard_batch",
    "TrainState", "create_train_state", "make_eval_step",
    "make_fused_sharded_train_step", "make_sharded_train_step",
    "make_train_step",
]
