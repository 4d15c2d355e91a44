"""Mesh/sharding support for the host-ingestion runner path.

The device-resident runners (`shared_runner.py`, `hanabi_runner.py`)
shard their whole episode program; the host runners instead ingest
numpy rollouts from external simulators (SMAC/GRF/Hanabi-C++ — the
reference's entire backend, `env_wrappers.py:140-396`). Their scaling
story (SURVEY §5.8: "envs sharded per host … batched transfer … psum
learner") is implemented here:

  * params live replicated on the mesh (or model-sharded on a 2-D
    (data, model) mesh — `parallel/mesh.py`);
  * the staged episode transfers to device ONCE per episode with the
    env axis sharded along 'data' (`NamedSharding(P(None, 'data'))` on
    the time-major [T(+1), N, …] blocks);
  * the jitted compute_returns + PPO update runs under those shardings,
    so XLA inserts the gradient / normalizer-statistic psums over
    'data' exactly as in the device-resident path;
  * multi-host: each process owns its LOCAL env pool and contributes
    its rows via `jax.make_array_from_process_local_data` — the global
    env batch is n_processes × local N (`parallel/distributed.py`).

Sharding never changes semantics, only layout: equality vs the
unsharded path is pinned by tests/test_host_mesh.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from onpolicy_tpu.parallel import mesh as mesh_lib


def make_host_mesh(cfg, n_envs: int):
    """Mesh from cfg.mesh_shape, or None for the single-device fast
    path. The local env count must split evenly over the data axis."""
    if int(np.prod(cfg.mesh_shape)) <= 1:
        return None
    mesh = mesh_lib.make_mesh(cfg.mesh_shape)
    dp = mesh.shape[mesh_lib.DATA_AXIS]
    n_global = n_envs * jax.process_count()
    if n_global % dp != 0:
        raise ValueError(
            f"global env batch {n_global} (= {n_envs} local × "
            f"{jax.process_count()} processes) not divisible by data "
            f"axis {dp}")
    return mesh


def shard_state(mesh, train_state):
    """Params/opt/vnorm replicated (or model-sharded on a 2-D mesh)."""
    if mesh is None:
        return train_state
    if mesh_lib.MODEL_AXIS in mesh.shape \
            and mesh.shape[mesh_lib.MODEL_AXIS] > 1:
        return mesh_lib.model_sharded_state(mesh, train_state)
    if jax.process_count() > 1:
        from onpolicy_tpu.parallel import distributed
        return distributed.replicate_global(mesh, train_state)
    return jax.device_put(train_state, mesh_lib.replicated(mesh))


def put_batched(mesh, x, batch_axis: int):
    """Transfer one staged block to device with the env axis sharded
    along 'data' (or an ordinary transfer when mesh is None).

    `x` holds this process's LOCAL env rows; under multi-host the
    global array is assembled from every process's contribution."""
    x = np.ascontiguousarray(x)
    if mesh is None:
        return jax.numpy.asarray(x)
    spec = [None] * x.ndim
    spec[batch_axis] = mesh_lib.DATA_AXIS
    ds = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        gshape = list(x.shape)
        gshape[batch_axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(ds, x, tuple(gshape))
    return jax.device_put(x, ds)


def act_state(mesh, train_state):
    """Per-process act-path copy of the train state.

    Under multi-host, each process acts on its OWN env rows with its
    own observations — those must not flow through the global SPMD
    program (multi-process global arrays assume every host passes
    identical values). The params are replicated, so an addressable
    local copy is one device_get away; refreshed once per episode
    after the (global) train step. Single-process: returns the state
    unchanged (zero overhead)."""
    if mesh is None or jax.process_count() == 1:
        return train_state
    if mesh_lib.MODEL_AXIS in mesh.shape \
            and mesh.shape[mesh_lib.MODEL_AXIS] > 1:
        raise NotImplementedError(
            "host-runner multi-host with model-sharded params is not "
            "supported: the per-step act path needs an addressable "
            "process-local parameter copy")
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(jax.device_get(x)), train_state)


def put_traj(mesh, traj: dict):
    """Stage dict of [T, N, …] blocks → device, env axis (1) sharded."""
    return {k: put_batched(mesh, v, 1) for k, v in traj.items()}


def put_last(mesh, last: dict):
    """Final-carry dict of [N, …] blocks → device, env axis (0) sharded."""
    return {k: put_batched(mesh, v, 0) for k, v in last.items()}
