"""simple_spread: N agents cover N landmarks, penalized for collisions.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_spread.py`:
agents collide, silent, size 0.15; landmarks non-colliding; dim_c=2;
reward (per agent) = −Σ_l min_a dist(a,l) − #collisions-with-this-agent,
where the reference's collision loop does NOT exclude the agent itself
(`simple_spread.py:79-84`) so every agent carries a constant −1 self-
collision term — reproduced for curve parity. Cooperative: env-level
reward is the sum over agents (`environment.py:138-141`).
obs = [vel(2), pos(2), landmark_rel(2K), other_pos_rel(2(M−1)),
comm_others(2(M−1))].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = True


def make_spec(args) -> WorldSpec:
    num_agents, num_landmarks = args.num_agents, args.num_landmarks
    episode_length = args.episode_length
    M, K = num_agents, num_landmarks
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=2, world_length=episode_length,
        agent_movable=(True,) * M, agent_silent=(True,) * M,
        agent_collide=(True,) * M, agent_size=(0.15,) * M,
        agent_accel=(None,) * M, agent_max_speed=(None,) * M,
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.05,) * K,
    )


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl = jax.random.split(key)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks, scale=0.8),
    )


def observation(spec: WorldSpec, state):
    obs = []
    for i in range(spec.n_agents):
        obs.append(jnp.concatenate([
            state.agent_vel[i],
            state.agent_pos[i],
            sc.rel_positions(state.landmark_pos, state.agent_pos[i:i + 1])[0],
            sc.others_concat(state.agent_pos - state.agent_pos[i], i),
            sc.others_concat(state.agent_comm[:, :spec.dim_c], i),
        ]))
    return tuple(obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    dists = sc.pairwise_dist(state.agent_pos, state.landmark_pos)  # [M, K]
    cover = -jnp.sum(jnp.min(dists, axis=0))                       # scalar
    # collision count per agent (self included — reference quirk)
    ad = sc.pairwise_dist(state.agent_pos, state.agent_pos)
    sizes = jnp.full((spec.n_agents,), 0.15)
    dmin = sizes[:, None] + sizes[None, :]
    collisions = jnp.sum((ad < dmin).astype(jnp.float32), axis=1)
    return cover - collisions


def info(spec: WorldSpec, state) -> dict:
    """benchmark_data analogue: per-agent collisions and min-dist sum."""
    dists = sc.pairwise_dist(state.agent_pos, state.landmark_pos)
    min_dists = jnp.sum(jnp.min(dists, axis=0))
    occupied = jnp.sum((jnp.min(dists, axis=0) < 0.1).astype(jnp.int32))
    return {"min_dists": min_dists, "occupied_landmarks": occupied}
