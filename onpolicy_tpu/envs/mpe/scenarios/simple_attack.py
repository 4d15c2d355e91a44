"""simple_attack: each agent races to its own goal landmark; adversaries
punish good agents for proximity/collisions.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_attack.py`:
num_adversaries + num_good_agents agents (adversaries first), all size
0.075 / accel 3.0 / max_speed 1.0; num_landmarks == num_agents, each
agent's goal is landmark i; landmarks collide, size 0.2, at 0.8·uniform;
dim_c=0 (everyone silent ⇒ all Discrete(5)). Rewards: every agent gets
−dist(self, goal_i) + 0.5·1{dist < goal.size}; good agents additionally
−0.1 per adversary within 0.15 and −0.5 per adversary contact;
adversaries −0.5 per (good, adv) contact pair; both get the boundary
penalty. (The reference's `bound` call site is a latent NameError —
`simple_attack.py:91-96,118-121` — we apply the evidently intended
penalty.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = False


def make_spec(args) -> WorldSpec:
    na, ng = args.num_adversaries, args.num_good_agents
    M = na + ng
    K = args.num_landmarks
    assert K == M, "simple_attack requires num_landmarks == num_agents"
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=0, world_length=args.episode_length,
        agent_movable=(True,) * M, agent_silent=(True,) * M,
        agent_collide=(True,) * M, agent_size=(0.075,) * M,
        agent_accel=(3.0,) * M, agent_max_speed=(1.0,) * M,
        agent_adversary=(True,) * na + (False,) * ng,
        landmark_collide=(True,) * K, landmark_movable=(False,) * K,
        landmark_size=(0.2,) * K,
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
        others_pos = sc.others_concat(state.agent_pos - state.agent_pos[i], i)
        others_vel = sc.others_concat(state.agent_vel, i)
        obs.append(jnp.concatenate([
            state.agent_vel[i], state.agent_pos[i],
            sc.rel_positions(state.landmark_pos, state.agent_pos[i:i + 1])[0],
            others_pos, others_vel]))
    return tuple(obs)


def _bound_penalty(x):
    return jnp.where(
        x < 0.9, 0.0,
        jnp.where(x < 1.0, (x - 0.9) * 10.0,
                  jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))


def reward(spec: WorldSpec, state) -> jax.Array:
    M = spec.n_agents
    adv = jnp.array(spec.agent_adversary)
    sizes = jnp.array(spec.agent_size)
    gsize = jnp.array(spec.landmark_size)

    goal_pos = state.landmark_pos[:M]     # agent i's goal = landmark i
    gd = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(state.agent_pos - goal_pos), -1), 1e-12))
    rew = -gd + 0.5 * (gd < gsize[:M]).astype(jnp.float32)

    d = sc.pairwise_dist(state.agent_pos, state.agent_pos)
    contact = d < (sizes[:, None] + sizes[None, :])
    near_adv = (d < 0.15) & adv[None, :]
    hit_adv = contact & adv[None, :]
    good_pen = (0.1 * jnp.sum(near_adv, axis=1)
                + 0.5 * jnp.sum(hit_adv, axis=1))
    pair = contact & (~adv[:, None]) & adv[None, :]
    adv_pen = 0.5 * jnp.sum(pair.astype(jnp.float32))

    rew = rew - jnp.where(adv, adv_pen, good_pen)
    rew = rew - jnp.sum(_bound_penalty(jnp.abs(state.agent_pos)), axis=-1)
    return rew


def info(spec: WorldSpec, state) -> dict:
    adv = jnp.array(spec.agent_adversary)
    sizes = jnp.array(spec.agent_size)
    d = sc.pairwise_dist(state.agent_pos, state.agent_pos)
    contact = d < (sizes[:, None] + sizes[None, :])
    pair = contact & (~adv[:, None]) & adv[None, :]
    return {"fail": jnp.any(pair)}
