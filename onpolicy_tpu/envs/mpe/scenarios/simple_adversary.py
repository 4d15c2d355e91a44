"""simple_adversary (physical deception): N−1 good agents must cover the
goal landmark while keeping an adversary (who doesn't know which
landmark is the goal) away from it.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/
simple_adversary.py`: agent 0 is the adversary; K = N−1 landmarks of
size 0.08; no collisions; landmark positions uniform(-1,1) (no 0.8).
Good reward = −min_good dist(a, goal) + Σ_adv dist(adv, goal) (shaped);
adversary reward = −‖pos − goal‖² (squared). Good obs
[goal_rel(2), landmark_rel(2K), other_pos(2(M−1))]; adversary obs drops
the goal — heterogeneous dims → separated policies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = False
NUM_ADVERSARIES = 1


def make_spec(args) -> WorldSpec:
    M = args.num_agents
    K = M - 1
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=2, world_length=args.episode_length,
        agent_movable=(True,) * M, agent_silent=(True,) * M,
        agent_collide=(False,) * M, agent_size=(0.15,) * M,
        agent_accel=(None,) * M, agent_max_speed=(None,) * M,
        agent_adversary=(True,) * NUM_ADVERSARIES + (False,) * (M - 1),
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.08,) * K,
    )


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl, kg = jax.random.split(key, 3)
    goal = jax.random.randint(kg, (), 0, spec.n_landmarks)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks),
        extras={"goal": goal},
    )


def observation(spec: WorldSpec, state):
    goal_pos = state.landmark_pos[state.extras["goal"]]
    obs = []
    for i in range(spec.n_agents):
        parts = []
        if not spec.agent_adversary[i]:
            parts.append(goal_pos - state.agent_pos[i])
        parts.append(
            sc.rel_positions(state.landmark_pos, state.agent_pos[i:i + 1])[0])
        parts.append(sc.others_concat(state.agent_pos - state.agent_pos[i], i))
        obs.append(jnp.concatenate(parts))
    return tuple(obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    goal_pos = state.landmark_pos[state.extras["goal"]]
    adv = jnp.array(spec.agent_adversary)
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(state.agent_pos - goal_pos), -1), 1e-12))
    d2 = jnp.sum(jnp.square(state.agent_pos - goal_pos), -1)
    adv_rew_term = jnp.sum(jnp.where(adv, d, 0.0))     # Σ adversary dists
    pos_rew = -jnp.min(jnp.where(adv, jnp.inf, d))     # min over good
    good_reward = pos_rew + adv_rew_term
    return jnp.where(adv, -d2, good_reward)
