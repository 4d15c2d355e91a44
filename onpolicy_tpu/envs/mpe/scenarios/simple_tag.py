"""simple_tag (predator-prey): slow adversaries chase faster good agents
around obstacle landmarks.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/simple_tag.py`:
first `num_adversaries` agents are predators (size .075, accel 3.0,
max_speed 1.0); good agents size .05, accel 4.0, max_speed 1.3;
colliding landmarks of size 0.2 at 0.8·uniform. Good reward: −10 per
adversary collision and a soft boundary penalty; adversary reward: +10
per (good, adversary) collision pair (reward shaping off, like the
reference). obs = [vel(2), pos(2), landmark_rel, other_pos,
other_vel(good others only)] — dims differ between roles.
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
    return WorldSpec(
        n_agents=M, n_landmarks=K, dim_c=2, world_length=args.episode_length,
        agent_movable=(True,) * M, agent_silent=(True,) * M,
        agent_collide=(True,) * M,
        agent_size=(0.075,) * na + (0.05,) * ng,
        agent_accel=(3.0,) * na + (4.0,) * ng,
        agent_max_speed=(1.0,) * na + (1.3,) * ng,
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
        parts = [state.agent_vel[i], state.agent_pos[i],
                 sc.rel_positions(state.landmark_pos,
                                  state.agent_pos[i:i + 1])[0],
                 sc.others_concat(state.agent_pos - state.agent_pos[i], i)]
        good_vels = [state.agent_vel[j] for j in range(spec.n_agents)
                     if j != i and not spec.agent_adversary[j]]
        if good_vels:
            parts.append(jnp.concatenate(good_vels))
        obs.append(jnp.concatenate(parts))
    return tuple(obs)


def _bound_penalty(x: jax.Array) -> jax.Array:
    """Soft screen-exit penalty (`simple_tag.py:102-108`)."""
    return jnp.where(
        x < 0.9, 0.0,
        jnp.where(x < 1.0, (x - 0.9) * 10.0,
                  jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))


def reward(spec: WorldSpec, state) -> jax.Array:
    adv = jnp.array(spec.agent_adversary)
    sizes = jnp.array(spec.agent_size)
    d = sc.pairwise_dist(state.agent_pos, state.agent_pos)
    collide = d < (sizes[:, None] + sizes[None, :])
    # (good, adversary) collision pairs
    pair = collide & (~adv[:, None]) & adv[None, :]
    good_hits = jnp.sum(pair.astype(jnp.float32), axis=1)   # per good agent
    total_pairs = jnp.sum(pair.astype(jnp.float32))

    bound = jnp.sum(_bound_penalty(jnp.abs(state.agent_pos)), axis=-1)
    good_reward = -10.0 * good_hits - bound
    adv_reward = 10.0 * total_pairs
    return jnp.where(adv, adv_reward, good_reward)
