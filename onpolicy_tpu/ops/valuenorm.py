"""Running value-target normalizer state (ValueNorm / PopArt statistics).

Functional re-derivation of the reference's debiased-EMA normalizers
(`/root/reference/onpolicy/utils/valuenorm.py`,
`/root/reference/onpolicy/algorithms/utils/popart.py:48-98`):

  state = (running_mean, running_mean_sq, debiasing_term), beta=0.99999
  debiased mean  = mean / clamp(debias, eps)
  debiased var   = clamp(mean_sq_debiased - mean_debiased², 1e-2)

The state is a pytree that threads through the jitted train step; under a
data-parallel mesh the batch moments must be identical on every shard
(achieved automatically under jit-with-sharding since the mean is a global
reduction; under shard_map use `pmean` on the batch moments first).

The PopArt weight/bias rescaling that keeps the critic head consistent
across stat updates lives with the head in `models/popart.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

EPS = 1e-5
VAR_CLAMP = 1e-2
DEFAULT_BETA = 0.99999


@struct.dataclass
class ValueNormState:
    running_mean: jax.Array      # [shape], usually [1]
    running_mean_sq: jax.Array   # [shape]
    debiasing_term: jax.Array    # scalar
    beta: float = struct.field(pytree_node=False, default=DEFAULT_BETA)
    per_element_update: bool = struct.field(pytree_node=False, default=False)
    norm_axes: int = struct.field(pytree_node=False, default=1)


def create(input_shape=1, *, beta: float = DEFAULT_BETA,
           per_element_update: bool = False, norm_axes: int = 1) -> ValueNormState:
    shape = (input_shape,) if isinstance(input_shape, int) else tuple(input_shape)
    return ValueNormState(
        running_mean=jnp.zeros(shape, jnp.float32),
        running_mean_sq=jnp.zeros(shape, jnp.float32),
        debiasing_term=jnp.zeros((), jnp.float32),
        beta=beta, per_element_update=per_element_update, norm_axes=norm_axes)


def mean_var(s: ValueNormState):
    debias = jnp.maximum(s.debiasing_term, EPS)
    mean = s.running_mean / debias
    mean_sq = s.running_mean_sq / debias
    var = jnp.maximum(mean_sq - jnp.square(mean), VAR_CLAMP)
    return mean, var


def update(s: ValueNormState, x: jax.Array) -> ValueNormState:
    axes = tuple(range(s.norm_axes))
    batch_mean = jnp.mean(x.astype(jnp.float32), axis=axes)
    batch_sq_mean = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
    if s.per_element_update:
        batch_size = 1
        for a in axes:
            batch_size *= x.shape[a]
        weight = s.beta ** batch_size
    else:
        weight = s.beta
    return s.replace(
        running_mean=s.running_mean * weight + batch_mean * (1.0 - weight),
        running_mean_sq=s.running_mean_sq * weight + batch_sq_mean * (1.0 - weight),
        debiasing_term=s.debiasing_term * weight + (1.0 - weight),
    )


def _bcast(stat: jax.Array, s: ValueNormState):
    return stat.reshape((1,) * s.norm_axes + stat.shape)


def normalize(s: ValueNormState, x: jax.Array) -> jax.Array:
    mean, var = mean_var(s)
    return (x - _bcast(mean, s)) / _bcast(jnp.sqrt(var), s)


def denormalize(s: ValueNormState, x: jax.Array) -> jax.Array:
    mean, var = mean_var(s)
    return x * _bcast(jnp.sqrt(var), s) + _bcast(mean, s)
