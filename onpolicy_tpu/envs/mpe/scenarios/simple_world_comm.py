"""simple_world_comm: predator-prey with a speaking predator leader,
food targets, and forests that hide occupants.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/
simple_world_comm.py`: agent 0 is the adversary leader (speaks, dim_c=4),
remaining adversaries silent (size .075, accel 3, max_speed 1), good
agents (size .045, accel 4, max_speed 1.3). Entity axis = K obstacle
landmarks (collide, size .2) ++ 2 food (size .03) ++ 2 forests
(size .3), all at 0.8·uniform. Forest visibility: another agent's
rel-pos/vel is zeroed unless you share a forest, both are outside all
forests, or you are the leader (`:250-262`). Good reward: −5 per
adversary contact, −2·bound(|x|) boundary penalty, +2 per food contact,
+0.05·min-food-distance (sign quirk preserved); adversary reward:
−0.1·min-dist-to-prey + 5 per (good, adv) contact pair. Obs layouts per
role match `:282-288` (good agents order in_forest before other_vel and
get no comm).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.world import WorldSpec

shared_reward = False
NUM_FOOD = 2
NUM_FORESTS = 2
DIM_C = 4


def make_spec(args) -> WorldSpec:
    na, ng = args.num_adversaries, args.num_good_agents
    M = na + ng
    K = args.num_landmarks           # obstacle landmarks only
    KT = K + NUM_FOOD + NUM_FORESTS  # full entity-axis landmark count
    return WorldSpec(
        n_agents=M, n_landmarks=KT, dim_c=DIM_C,
        world_length=args.episode_length,
        agent_movable=(True,) * M,
        agent_silent=(False,) + (True,) * (M - 1),   # only the leader speaks
        agent_collide=(True,) * M,
        agent_size=(0.075,) * na + (0.045,) * ng,
        agent_accel=(3.0,) * na + (4.0,) * ng,
        agent_max_speed=(1.0,) * na + (1.3,) * ng,
        agent_adversary=(True,) * na + (False,) * ng,
        landmark_collide=(True,) * K + (False,) * (NUM_FOOD + NUM_FORESTS),
        landmark_movable=(False,) * KT,
        landmark_size=(0.2,) * K + (0.03,) * NUM_FOOD + (0.3,) * NUM_FORESTS,
    )


def _slices(spec):
    K = spec.n_landmarks - NUM_FOOD - NUM_FORESTS
    return K, slice(K, K + NUM_FOOD), slice(K + NUM_FOOD, spec.n_landmarks)


def reset(spec: WorldSpec, key: jax.Array):
    ka, kl = jax.random.split(key)
    return sc.base_state(
        spec,
        sc.uniform_positions(ka, spec.n_agents),
        sc.uniform_positions(kl, spec.n_landmarks, scale=0.8),
    )


def _in_forest(spec, state):
    """[M, NUM_FORESTS] bool: agent i overlaps forest f (is_collision)."""
    _, _, forests = _slices(spec)
    fpos = state.landmark_pos[forests]
    fsize = jnp.array(spec.landmark_size)[forests]
    asize = jnp.array(spec.agent_size)
    d = sc.pairwise_dist(state.agent_pos, fpos)
    return d < (asize[:, None] + fsize[None, :])


def observation(spec: WorldSpec, state):
    M = spec.n_agents
    adv = spec.agent_adversary
    inf = _in_forest(spec, state)                    # [M, 2]
    in_forest_feat = jnp.where(inf, 1.0, -1.0)
    leader_c = state.agent_comm[0, :DIM_C]
    obs = []
    for i in range(M):
        entity_rel = sc.rel_positions(state.landmark_pos,
                                      state.agent_pos[i:i + 1])[0]
        vis_other, vis_vel = [], []
        for j in range(M):
            if j == i:
                continue
            share = jnp.any(inf[i] & inf[j])
            both_out = (~jnp.any(inf[i])) & (~jnp.any(inf[j]))
            visible = share | both_out | (i == 0)    # leader sees all
            rel = jnp.where(visible, state.agent_pos[j] - state.agent_pos[i],
                            0.0)
            vis_other.append(rel)
            if not adv[j]:
                vis_vel.append(jnp.where(visible, state.agent_vel[j], 0.0))
        other_pos = jnp.concatenate(vis_other)
        other_vel = (jnp.concatenate(vis_vel) if vis_vel
                     else jnp.zeros((0,)))
        base = [state.agent_vel[i], state.agent_pos[i], entity_rel]
        if adv[i]:
            parts = base + [other_pos, other_vel, in_forest_feat[i], leader_c]
        else:
            parts = base + [other_pos, in_forest_feat[i], other_vel]
        obs.append(jnp.concatenate(parts))
    return tuple(obs)


def _bound_penalty(x):
    return jnp.where(
        x < 0.9, 0.0,
        jnp.where(x < 1.0, (x - 0.9) * 10.0,
                  jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))


def reward(spec: WorldSpec, state) -> jax.Array:
    adv = jnp.array(spec.agent_adversary)
    sizes = jnp.array(spec.agent_size)
    _, food_sl, _ = _slices(spec)

    d = sc.pairwise_dist(state.agent_pos, state.agent_pos)
    contact = d < (sizes[:, None] + sizes[None, :])
    hit_by_adv = jnp.sum((contact & adv[None, :]).astype(jnp.float32), axis=1)
    pair_total = jnp.sum((contact & (~adv[:, None]) & adv[None, :])
                         .astype(jnp.float32))

    fpos = state.landmark_pos[food_sl]
    fsize = jnp.array(spec.landmark_size)[food_sl]
    fd = sc.pairwise_dist(state.agent_pos, fpos)
    food_hits = jnp.sum((fd < (sizes[:, None] + fsize[None, :]))
                        .astype(jnp.float32), axis=1)
    min_food = jnp.min(fd, axis=1)

    bound = jnp.sum(_bound_penalty(jnp.abs(state.agent_pos)), axis=-1)
    good_reward = (-5.0 * hit_by_adv - 2.0 * bound + 2.0 * food_hits
                   + 0.05 * min_food)

    min_prey = jnp.min(jnp.where(adv[None, :], jnp.inf, d), axis=1)
    adv_reward = -0.1 * min_prey + 5.0 * pair_total
    return jnp.where(adv, adv_reward, good_reward)
