"""simple_crypto: Alice (speaker) must communicate a goal color to Bob
(listener) over a channel Eve (adversary) can hear, using a shared key.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_crypto.py`:
3 immobile agents — agent0 Eve (adversary listener), agent1 Bob (good
listener), agent2 Alice (speaker); dim_c=4; K landmarks with one-hot
dim_c colors; goal and key are random landmark colors. Rewards (post-
reset, all comm starts zero → the zero-c guard): good agents get
−‖c_Bob − goal‖² + ‖c_Eve − goal‖²; Eve gets −‖c_Eve − goal‖².
Obs: Alice [goal(4), key(4)]; Bob [key(4), c_Alice(4)]; Eve [c_Alice(4)].
All action spaces are Discrete(dim_c) (comm-only; nobody moves).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = False
DIM_C = 4


def make_spec(args) -> WorldSpec:
    M, K = args.num_agents, args.num_landmarks
    assert M == 3, "simple_crypto uses exactly 3 agents (Eve, Bob, Alice)"
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=DIM_C,
        world_length=args.episode_length,
        agent_movable=(False,) * M, agent_silent=(False,) * M,
        agent_collide=(False,) * M, agent_size=(0.05,) * M,
        agent_accel=(None,) * M, agent_max_speed=(None,) * M,
        agent_adversary=(True, False, False),
        landmark_collide=(False,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.05,) * K,
    )


def _landmark_colors(K: int) -> jax.Array:
    return jnp.eye(DIM_C)[:K]      # one-hot dim_c colors per landmark


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl, kg, kk = jax.random.split(key, 4)
    goal = jax.random.randint(kg, (), 0, spec.n_landmarks)
    key_idx = jax.random.randint(kk, (), 0, spec.n_landmarks)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks),
        extras={"goal": goal, "key": key_idx},
    )


def observation(spec: WorldSpec, state):
    colors = _landmark_colors(spec.n_landmarks)
    goal_color = colors[state.extras["goal"]]
    key_color = colors[state.extras["key"]]
    c_alice = state.agent_comm[2, :DIM_C]
    eve_obs = c_alice
    bob_obs = jnp.concatenate([key_color, c_alice])
    alice_obs = jnp.concatenate([goal_color, key_color])
    return (eve_obs, bob_obs, alice_obs)


def reward(spec: WorldSpec, state) -> jax.Array:
    colors = _landmark_colors(spec.n_landmarks)
    goal = colors[state.extras["goal"]]
    c = state.agent_comm[:, :DIM_C]
    nonzero = jnp.any(c != 0.0, axis=-1).astype(jnp.float32)   # [M]
    err = jnp.sum(jnp.square(c - goal), axis=-1)               # [M]
    bob_term = -nonzero[1] * err[1]
    eve_term = nonzero[0] * err[0]
    good_reward = bob_term + eve_term
    eve_reward = -nonzero[0] * err[0]
    return jnp.stack([eve_reward, good_reward, good_reward])
