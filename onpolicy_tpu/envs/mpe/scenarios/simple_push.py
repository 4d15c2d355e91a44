"""simple_push: an adversary tries to push good agents off their goal
landmark.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_push.py`:
agent 0 adversary, all collide, default sizes; K landmarks at
0.8·uniform; landmark i color = [0.1,0.1,0.1] + 0.8 at channel i+1;
shared random goal landmark. Good reward −dist(agent, goal); adversary
reward min_good dist(a, goal) − dist(adv, goal). Good obs
[vel, goal_rel, color(3), landmark_rel, landmark_colors(3K), other_pos];
adversary obs [vel, landmark_rel, other_pos].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = False
NUM_ADVERSARIES = 1


def make_spec(args) -> WorldSpec:
    M, K = args.num_agents, args.num_landmarks
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=2, world_length=args.episode_length,
        agent_movable=(True,) * M, agent_silent=(True,) * M,
        agent_collide=(True,) * M, agent_size=(0.05,) * M,
        agent_accel=(None,) * M, agent_max_speed=(None,) * M,
        agent_adversary=(True,) * NUM_ADVERSARIES + (False,) * (M - 1),
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.05,) * K,
    )


def _landmark_colors(K: int) -> jax.Array:
    base = jnp.full((K, 3), 0.1)
    idx = jnp.minimum(jnp.arange(K) + 1, 2)
    return base.at[jnp.arange(K), idx].add(0.8)


def _agent_color(goal: jax.Array) -> jax.Array:
    """Good-agent color encodes the goal index (`simple_push.py:49-55`)."""
    base = jnp.full((3,), 0.25)
    idx = jnp.minimum(goal + 1, 2)
    return base.at[idx].add(0.5)


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl, kg = jax.random.split(key, 3)
    goal = jax.random.randint(kg, (), 0, spec.n_landmarks)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks, scale=0.8),
        extras={"goal": goal},
    )


def observation(spec: WorldSpec, state):
    K = spec.n_landmarks
    goal = state.extras["goal"]
    goal_pos = state.landmark_pos[goal]
    lcolors = _landmark_colors(K).reshape(-1)
    acolor = _agent_color(goal)
    obs = []
    for i in range(spec.n_agents):
        lrel = sc.rel_positions(state.landmark_pos, state.agent_pos[i:i + 1])[0]
        others = sc.others_concat(state.agent_pos - state.agent_pos[i], i)
        if spec.agent_adversary[i]:
            obs.append(jnp.concatenate([state.agent_vel[i], lrel, others]))
        else:
            obs.append(jnp.concatenate([
                state.agent_vel[i], goal_pos - state.agent_pos[i], acolor,
                lrel, lcolors, others]))
    return tuple(obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    adv = jnp.array(spec.agent_adversary)
    goal_pos = state.landmark_pos[state.extras["goal"]]
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(state.agent_pos - goal_pos), -1), 1e-12))
    min_good = jnp.min(jnp.where(adv, jnp.inf, d))
    return jnp.where(adv, min_good - d, -d)
