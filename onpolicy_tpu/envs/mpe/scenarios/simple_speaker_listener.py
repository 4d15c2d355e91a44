"""simple_speaker_listener: immobile speaker sees the goal color and must
direct the deaf-but-mobile listener to the goal landmark.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/
simple_speaker_listener.py`: dim_c=3; agent 0 (speaker) not movable, not
silent; agent 1 (listener) movable, silent; agent size 0.075; landmark
size 0.04; landmark positions uniform(-1,1) (no 0.8 scale here). Both
agents receive −‖listener − goal‖². Heterogeneous spaces: speaker acts
Discrete(3) (comm only), listener Discrete(5); speaker obs is the 3-dim
goal color, listener obs [vel(2), landmark_rel(6), comm_speaker(3)] —
requires separated policies, like the reference
(`train_mpe.py:82-83`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = True

LANDMARK_COLORS = jnp.array([
    [0.65, 0.15, 0.15],
    [0.15, 0.65, 0.15],
    [0.15, 0.15, 0.65],
], np.float64)


def make_spec(args) -> WorldSpec:
    num_agents, num_landmarks = args.num_agents, args.num_landmarks
    episode_length = args.episode_length
    assert num_agents == 2, "simple_speaker_listener supports exactly 2 agents"
    K = num_landmarks
    return WorldSpec(
        n_agents=2, n_landmarks=K, dim_c=3, world_length=episode_length,
        agent_movable=(False, True), agent_silent=(False, True),
        agent_collide=(False, False), agent_size=(0.075, 0.075),
        agent_accel=(None, None), agent_max_speed=(None, None),
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.04,) * K,
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
    colors = LANDMARK_COLORS[:spec.n_landmarks]
    goal_color = colors[state.extras["goal"] % colors.shape[0]]
    speaker_obs = goal_color
    listener_obs = jnp.concatenate([
        state.agent_vel[1],
        sc.rel_positions(state.landmark_pos, state.agent_pos[1:2])[0],
        state.agent_comm[0, :spec.dim_c],   # speaker's utterance
    ])
    return (speaker_obs, listener_obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    d2 = jnp.sum(jnp.square(
        state.agent_pos[1] - state.landmark_pos[state.extras["goal"]]))
    return jnp.stack([-d2, -d2])
