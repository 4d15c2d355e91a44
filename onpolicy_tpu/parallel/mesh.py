"""Device mesh + sharding helpers.

The reference has no device parallelism at all (single `cuda:0`,
SURVEY §2.9); scaling is re-designed TPU-natively here: a
`jax.sharding.Mesh` with a 'data' axis over which the env/batch
dimension is sharded, params replicated, and XLA inserting the psum
collectives for gradients and normalizer statistics automatically under
jit-with-shardings (the scaling-book recipe: pick a mesh, annotate
shardings, let XLA do the rest).

Multi-host: the same annotations extend to a pod slice —
`jax.distributed.initialize` + a mesh spanning all devices; env batch
shards ride per-host, collectives ride ICI.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(mesh_shape: Tuple[int, ...] = (1,)) -> Mesh:
    n = int(np.prod(mesh_shape))
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(mesh_shape), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/batch) axis along 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_train_inputs(mesh: Mesh, train_state, carry):
    """Place params replicated and the rollout carry env-sharded.

    jit then propagates these shardings through the episode program; the
    PPO minibatch batch axis inherits the env shard, so gradient
    reductions become psums over 'data'."""
    rep = replicated(mesh)
    ds = data_sharded(mesh)
    train_state = jax.device_put(train_state, rep)
    carry = jax.tree_util.tree_map(lambda x: jax.device_put(x, ds), carry)
    return train_state, carry
