"""Scenario protocol for the pure-JAX MPE engine.

A scenario is a module providing pure functions over (spec, state):

  make_spec(num_agents, num_landmarks, episode_length) -> WorldSpec
  reset(spec, key) -> WorldState              # initial state incl. extras
  observation(spec, state) -> tuple[jax.Array, ...]   # per-agent obs
  reward(spec, state) -> jax.Array            # [M] per-agent rewards
  shared_reward: bool                         # world.collaborative

(the reference expresses these as callbacks into scenario objects,
`/root/reference/onpolicy/envs/mpe/scenario.py`,
`environment.py:115-189`).

Helpers below cover the common reset/geometry code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe.world import WorldSpec, WorldState


def uniform_positions(key, n: int, scale: float = 1.0) -> jax.Array:
    return scale * jax.random.uniform(key, (n, 2), jnp.float32, -1.0, 1.0)


def base_state(spec: WorldSpec, agent_pos, landmark_pos, extras=None) -> WorldState:
    M, K, C = spec.n_agents, spec.n_landmarks, spec.dim_c
    return WorldState(
        agent_pos=agent_pos,
        agent_vel=jnp.zeros((M, 2), jnp.float32),
        agent_comm=jnp.zeros((M, max(C, 1)), jnp.float32),
        landmark_pos=landmark_pos,
        landmark_vel=jnp.zeros((K, 2), jnp.float32),
        t=jnp.zeros((), jnp.int32),
        extras=extras or {},
    )


def pairwise_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """a: [N,2], b: [K,2] → [N,K] euclidean distances."""
    d = a[:, None, :] - b[None, :, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(d), -1), 1e-12))


def rel_positions(targets: jax.Array, agent_pos: jax.Array) -> jax.Array:
    """targets: [K,2] relative to each agent [M,2] → [M, K*2] flattened."""
    rel = targets[None, :, :] - agent_pos[:, None, :]
    return rel.reshape(agent_pos.shape[0], -1)


def others_concat(values: jax.Array, agent_idx: int) -> jax.Array:
    """Concatenate rows of `values` [M, D] excluding row agent_idx
    (preserving order), matching the reference's `for other in agents:
    if other is agent: continue` loops."""
    M = values.shape[0]
    rows = [values[j] for j in range(M) if j != agent_idx]
    return jnp.concatenate(rows, axis=0) if rows else jnp.zeros((0,))
