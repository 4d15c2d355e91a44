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
    cfg = cfg.replace(mesh_shape=(jax.device_count(),))
    SharedRunner(cfg).run(...)

Host-sharded env feeding: with `jax.make_array_from_process_local_data`
each host contributes its local slice of the global env batch; the
device-side MPE path needs nothing special (states live sharded on
device already).
"""
from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None) -> None:
    """jax.distributed.initialize with TPU auto-detection; explicit args
    for CPU/GPU test rigs."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int) -> slice:
    """The half-open [start, stop) range of the global env batch this
    process owns (contiguous block partitioning)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes")
    return slice(i * per, (i + 1) * per)
