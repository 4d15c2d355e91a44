"""simple_reference: 2 agents, each must guide the OTHER to a secret goal
landmark via a 10-symbol comm channel.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_reference.py`:
dim_c=10, non-colliding agents, landmark colors are the fixed RGB triplet
per index; agent i's goal_a is the other agent, goal_b a random landmark.
reward_i = −‖pos(goal_a_i) − pos(goal_b_i)‖²; cooperative shared sum.
obs = [vel(2), landmark_rel(2K), goal_b_color(3), comm_other(10)].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = True

LANDMARK_COLORS = jnp.array([
    [0.75, 0.25, 0.25],
    [0.25, 0.75, 0.25],
    [0.25, 0.25, 0.75],
], np.float64)


def make_spec(args) -> WorldSpec:
    num_agents, num_landmarks = args.num_agents, args.num_landmarks
    episode_length = args.episode_length
    assert num_agents == 2, "simple_reference supports exactly 2 agents"
    M, K = num_agents, num_landmarks
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=10, world_length=episode_length,
        agent_movable=(True,) * M, agent_silent=(False,) * M,
        agent_collide=(False,) * M, agent_size=(0.05,) * M,
        agent_accel=(None,) * M, agent_max_speed=(None,) * M,
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.05,) * K,
    )


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl, kg = jax.random.split(key, 3)
    goal_b = jax.random.randint(kg, (2,), 0, spec.n_landmarks)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks, scale=0.8),
        extras={"goal_b": goal_b},
    )


def observation(spec: WorldSpec, state):
    colors = LANDMARK_COLORS[:spec.n_landmarks]
    obs = []
    for i in range(spec.n_agents):
        goal_color = colors[state.extras["goal_b"][i] % colors.shape[0]]
        obs.append(jnp.concatenate([
            state.agent_vel[i],
            sc.rel_positions(state.landmark_pos, state.agent_pos[i:i + 1])[0],
            goal_color,
            sc.others_concat(state.agent_comm[:, :spec.dim_c], i),
        ]))
    return tuple(obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    goal_b = state.extras["goal_b"]
    # agent i is rewarded for the OTHER agent reaching i's goal landmark
    rews = []
    for i in range(spec.n_agents):
        other = 1 - i
        d2 = jnp.sum(jnp.square(
            state.agent_pos[other] - state.landmark_pos[goal_b[i]]))
        rews.append(-d2)
    return jnp.stack(rews)
