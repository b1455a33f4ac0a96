"""Device mesh + sharding for SPMD data-parallel training.

TPU-native replacement for the reference's DDP machinery
(`DissimilarDomains/train.py:472-500` NCCL process-group spawn,
`training_loop.py:273-287` DDP wrap, `torch_utils/misc.py:179-188` round-gated
grad sync): a single jit'd program over a `jax.sharding.Mesh` whose 'data'
axis rides ICI; XLA inserts the gradient all-reduce where the loss mean
crosses the batch axis.  Multi-host extends the same mesh over DCN via
`jax.distributed.initialize` — no rendezvous files, no DDP objects.

The same helpers drive the virtual CPU mesh used in tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place host arrays onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if x is not None else None, batch)


def place_state(mesh: Mesh, state):
    """Replicate a train state (params/opt/EMA/scalars) across the mesh."""
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, *batch, key) -> (state, metrics) step for the mesh.

    Shardings are carried by the arguments: place the state with
    :func:`place_state` (replicated) and batches with :func:`shard_batch`
    (leading axis over 'data'); jit propagates them and XLA inserts the
    gradient all-reduce where the loss mean crosses the batch axis.
    """
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())


def check_replica_consistency(tree: Any, name: str = "params") -> None:
    """Verify that replicated arrays hold identical values on every
    addressable device — the analogue of the reference's pre-snapshot
    `misc.check_ddp_consistency` parameter-hash agreement across DDP ranks
    (torch_utils/misc.py:191-203).  Under jit'd SPMD divergence cannot
    arise inside a step; this guards host-side state edits and restores.

    Leaves that are genuinely sharded (shard shape != full shape) are
    skipped.  Raises AssertionError naming the first divergent leaf.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if not isinstance(leaf, jax.Array) or not leaf.addressable_shards:
            continue
        shards = leaf.addressable_shards
        if shards[0].data.shape != leaf.shape:
            continue  # sharded, not replicated
        ref = np.asarray(shards[0].data)
        for shard in shards[1:]:
            if not np.array_equal(np.asarray(shard.data), ref,
                                  equal_nan=True):
                leaf_name = ".".join(str(getattr(k, "key", k)) for k in path)
                raise AssertionError(
                    f"replica mismatch in {name}.{leaf_name} between devices "
                    f"{shards[0].device} and {shard.device}")
