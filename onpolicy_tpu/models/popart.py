"""PopArt critic head: a linear output layer whose weights are rescaled
whenever the running target statistics move, preserving the head's
denormalized outputs (Pop-Art, van Hasselt et al. 2016).

Parity with `/root/reference/onpolicy/algorithms/utils/popart.py:48-98`:
  * stats: debiased EMA (β=0.99999) of mean / mean², var clamped ≥1e-2;
  * update(targets): w ← w·σ_old/σ_new, b ← (σ_old·b + μ_old − μ_new)/σ_new.

Functional form: the head's (params, stats) thread through the train step;
`update` returns both new params and new stats. Under data parallelism the
batch moments are global reductions, so every replica applies the same
rescale (the PopArt+psum consistency requirement from SURVEY §7.3).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm
from onpolicy_tpu.ops import valuenorm as vn


def init(key, input_dim: int, output_dim: int = 1, *,
         use_orthogonal: bool = True, beta: float = vn.DEFAULT_BETA
         ) -> Tuple[dict, vn.ValueNormState]:
    params = cm.linear_init(key, input_dim, output_dim, gain=1.0,
                            use_orthogonal=use_orthogonal)
    return params, vn.create(output_dim, beta=beta)


def apply(params, x: jax.Array) -> jax.Array:
    """Forward pass — outputs live in *normalized* target space."""
    return cm.linear_apply(params, x)


def update(params: dict, state: vn.ValueNormState, targets: jax.Array
           ) -> Tuple[dict, vn.ValueNormState]:
    """Fold a batch of raw targets into the stats and rescale the head."""
    old_mean, old_var = vn.mean_var(state)
    old_std = jnp.sqrt(old_var)
    state = vn.update(state, targets)
    new_mean, new_var = vn.mean_var(state)
    new_std = jnp.sqrt(new_var)
    new_params = {
        "w": params["w"] * (old_std / new_std),           # [in, out] * [out]
        "b": (old_std * params["b"] + old_mean - new_mean) / new_std,
    }
    return new_params, state
