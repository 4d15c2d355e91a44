"""Device mesh + sharding helpers.

The reference has no device parallelism at all (single `cuda:0`,
SURVEY §2.9); scaling is re-designed TPU-natively here following the
scaling-book recipe — pick a mesh, annotate input shardings, let XLA
insert the collectives:

  * 1-D mesh `(data,)` — the default. The env/batch axis is sharded
    along 'data', params replicated; gradient and normalizer-statistic
    reductions become psums over 'data'.
  * 2-D mesh `(data, model)` — optional tensor parallelism for
    Hanabi-class widths (hidden 512+): hidden dimensions of weight
    matrices are additionally sharded along 'model'
    (megatron-style column sharding; XLA propagates and inserts the
    all-gathers/reduce-scatters). Enable with `--mesh_shape D,M`.
    Shardings never change semantics, only layout — validated in
    tests/test_sharding.py.

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
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Tuple[int, ...] = (1,)) -> Mesh:
    n = int(np.prod(mesh_shape))
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, "
                         f"have {len(devices)}")
    if len(mesh_shape) not in (1, 2):
        raise ValueError(f"mesh_shape must be (data,) or (data, model), "
                         f"got {mesh_shape}")
    axes = (DATA_AXIS,) if len(mesh_shape) == 1 else (DATA_AXIS, MODEL_AXIS)
    return Mesh(np.array(devices[:n]).reshape(mesh_shape), axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/batch) axis along 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _param_spec(x, tp: int) -> P:
    """Tensor-parallel spec for one parameter leaf: prefer the LAST
    (output/hidden) dim when divisible — megatron column sharding —
    falling back to the second-to-last (e.g. the [H, 1] value head);
    replicate anything indivisible. Layout-only: semantics unchanged."""
    if x.ndim >= 2:
        if x.shape[-1] % tp == 0:
            return P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
        if x.shape[-2] % tp == 0:
            return P(*([None] * (x.ndim - 2) + [MODEL_AXIS, None]))
    elif x.ndim == 1 and x.shape[0] % tp == 0:
        return P(MODEL_AXIS)
    return P()


def model_sharded_state(mesh: Mesh, train_state):
    """Place a TrainState with hidden dims sharded along 'model'.

    Applies uniformly to params AND optimizer moments (optax states
    mirror param shapes, so the same leaf rule keeps them co-sharded);
    scalars / indivisible leaves replicate."""
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _param_spec(jax.numpy.asarray(x), tp))),
        train_state)


def shard_train_inputs(mesh: Mesh, train_state, carry):
    """Place params replicated (or model-sharded on a 2-D mesh) and the
    rollout carry env-sharded.

    jit then propagates these shardings through the episode program; the
    PPO minibatch batch axis inherits the env shard, so gradient
    reductions become psums over 'data' (and matmul partial sums become
    reduce-scatters over 'model' when present)."""
    if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1:
        train_state = model_sharded_state(mesh, train_state)
    else:
        train_state = jax.device_put(train_state, replicated(mesh))
    ds = data_sharded(mesh)
    carry = jax.tree_util.tree_map(lambda x: jax.device_put(x, ds), carry)
    return train_state, carry
