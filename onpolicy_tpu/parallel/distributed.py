"""Multi-host (pod-slice) initialization.

The reference is strictly single-process (SURVEY §2.9). The TPU-native
scaling story: each host runs this same program, `jax.distributed`
connects them, and the SAME mesh annotations from `parallel/mesh.py`
span every chip in the slice — env batches shard per host (each host
steps only its local envs / owns its local buffer shard), parameters
replicate, and gradient/normalizer reductions ride ICI via the psums XLA
inserts. No code changes versus single-host: `Mesh(jax.devices(), ...)`
simply contains all chips.

Usage (per host):
    from onpolicy_tpu.parallel import distributed
    distributed.initialize()            # env-driven (TPU pods auto-detect)
    cfg = cfg.replace(mesh_shape=distributed.global_mesh_shape(cfg))
    SharedRunner(cfg).run(...)

Host-sharded env feeding: each host computes the (deterministic,
same-key) full reset but contributes only its `local_batch_slice` via
`jax.make_array_from_process_local_data`; the device-side MPE path
needs nothing special (states live sharded on device from then on).

Exercised by `tests/test_multihost.py`: two CPU processes × 4 virtual
devices run sharded episodes whose metrics match a single-process run.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

from onpolicy_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address=None, num_processes=None,
               process_id=None) -> None:
    """jax.distributed.initialize with TPU auto-detection; explicit args
    for CPU/GPU test rigs."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh_shape(cfg=None) -> Tuple[int, ...]:
    """Mesh shape spanning the whole slice. A user-requested 2-D
    (data, model) mesh composes with multi-host: the model axis is kept
    and only the data axis scales with the global device count."""
    n = jax.device_count()
    tp = 1
    if cfg is not None and len(cfg.mesh_shape) == 2:
        tp = cfg.mesh_shape[1]
    if n % tp != 0:
        raise ValueError(f"model axis {tp} does not divide {n} devices")
    return (n // tp, tp) if tp > 1 else (n,)


def local_batch_slice(global_batch: int) -> slice:
    """The half-open [start, stop) range of the global env batch this
    process owns (contiguous block partitioning)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes")
    return slice(i * per, (i + 1) * per)


def host_to_global_batch(mesh, tree, global_batch: int):
    """Assemble globally env-sharded arrays from per-host slices.

    `tree` holds the FULL batch (every host computes the same reset from
    the same key); each host hands only its `local_batch_slice` rows to
    `jax.make_array_from_process_local_data`, which stitches them into
    one global array sharded along 'data'."""
    sl = local_batch_slice(global_batch)
    ds = mesh_lib.data_sharded(mesh)
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(ds, x[sl], x.shape)
    return jax.tree_util.tree_map(put, tree)


def replicate_global(mesh, tree):
    """Replicate a pytree across all hosts' devices (every host passes
    the same locally-computed value, e.g. params from a shared seed)."""
    rs = mesh_lib.replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rs, np.asarray(x), np.shape(x)), tree)


def shard_train_inputs_multihost(mesh, train_state, carry, global_batch: int):
    """Multi-process analogue of `mesh.shard_train_inputs`: params
    replicated globally, rollout carry sharded along 'data' with each
    host contributing its local env rows."""
    train_state = replicate_global(mesh, train_state)
    carry = host_to_global_batch(mesh, carry, global_batch)
    return train_state, carry
