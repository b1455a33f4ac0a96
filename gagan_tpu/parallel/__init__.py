"""Mesh construction and sharding policies (ICI data axis, DCN multi-host)."""

from .mesh import (
    batch_sharding,
    check_replica_consistency,
    create_mesh,
    place_state,
    replicated,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "batch_sharding",
    "check_replica_consistency",
    "create_mesh",
    "place_state",
    "replicated",
    "shard_batch",
    "shard_train_step",
]
