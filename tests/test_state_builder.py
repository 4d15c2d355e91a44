"""SMAC agent-specific state builder tests (synthetic units, no SC2)."""
import numpy as np
import pytest

from onpolicy_tpu.envs.starcraft2.state_builder import (
    Snapshot, StateConfig, agent_specific_state, all_agent_states, state_dim)


def _cfg(**kw):
    d = dict(n_agents=3, n_enemies=2, n_actions=8, map_x=32, map_y=32,
             max_distance_x=32, max_distance_y=32, unit_type_bits=2,
             shield_bits_ally=1, shield_bits_enemy=1)
    d.update(kw)
    return StateConfig(**d)


def _snap(cfg, **kw):
    M, E, A = cfg.n_agents, cfg.n_enemies, cfg.n_actions
    d = dict(
        ally_x=np.array([10.0, 12.0, 20.0]),
        ally_y=np.array([10.0, 10.0, 10.0]),
        ally_health=np.array([50.0, 25.0, 100.0]),
        ally_health_max=np.array([100.0] * M),
        ally_shield=np.array([10.0, 0.0, 5.0]),
        ally_shield_max=np.array([20.0] * M),
        ally_type=np.array([0, 1, 0]),
        ally_cooldown=np.array([5.0, 0.0, 10.0]),
        ally_max_cooldown=np.array([10.0] * M),
        enemy_x=np.array([11.0, 30.0]),
        enemy_y=np.array([10.0, 30.0]),
        enemy_health=np.array([80.0, 0.0]),       # enemy 1 dead
        enemy_health_max=np.array([100.0] * E),
        enemy_shield=np.array([20.0, 0.0]),
        enemy_shield_max=np.array([40.0] * E),
        enemy_type=np.array([1, 0]),
        sight_range=np.array([9.0] * M),
        avail_actions=np.ones((M, A), np.float32),
        last_actions=np.eye(M, A, dtype=np.float32),
    )
    d.update(kw)
    return Snapshot(**d)


def test_dims_match():
    cfg = _cfg()
    snap = _snap(cfg)
    s = agent_specific_state(cfg, snap, 0)
    assert s.shape == (state_dim(cfg),)
    allst = all_agent_states(cfg, snap)
    assert allst.shape == (3, state_dim(cfg))


def test_field_contents():
    cfg = _cfg()
    snap = _snap(cfg)
    s = agent_specific_state(cfg, snap, 0)
    nf_al = 4 + 1 + 2 + 2 + 2 + cfg.n_actions   # vis/dist/rel + cd + h,sh + cxy + type + lastact
    # ally 0 in the list is agent 1: dist 2, within sight 9
    ally0 = s[:nf_al]
    assert ally0[0] == 1.0                       # visible
    np.testing.assert_allclose(ally0[1], 2 / 9)  # distance
    np.testing.assert_allclose(ally0[2], 2 / 9)  # rel x
    assert ally0[4] == 0.0                       # cooldown 0/10
    np.testing.assert_allclose(ally0[5], 0.25)   # health 25/100
    # center xy BEFORE type for allies
    np.testing.assert_allclose(ally0[7], (12 - 16) / 32)
    assert ally0[9 + 1] == 1.0                   # type one-hot id 1
    # last action one-hot of ally 1
    assert ally0[nf_al - cfg.n_actions + 1] == 1.0

    # enemy block: enemy 0 alive at dist 1
    nf_en = 5 + 2 + 2 + 2
    en = s[2 * nf_al: 2 * nf_al + nf_en]
    assert en[0] == 1.0                          # attackable (avail all 1)
    np.testing.assert_allclose(en[1], 1 / 9)
    assert en[4] == 1.0                          # visible
    np.testing.assert_allclose(en[5], 0.8)       # health
    np.testing.assert_allclose(en[6], 0.5)       # shield
    assert en[7 + 1] == 1.0                      # type BEFORE center for enemies
    # dead enemy row all zero
    en1 = s[2 * nf_al + nf_en: 2 * nf_al + 2 * nf_en]
    np.testing.assert_array_equal(en1, 0)


def test_dead_agent_zero_state():
    cfg = _cfg()
    snap = _snap(cfg, ally_health=np.array([0.0, 25.0, 100.0]))
    s = agent_specific_state(cfg, snap, 0)
    # everything zero except the agent-id one-hot
    assert s[-cfg.n_agents + 0] == 1.0
    np.testing.assert_array_equal(s[:-cfg.n_agents], 0)


def test_agent_id_and_timestep():
    cfg = _cfg(state_timestep_number=True, episode_limit=100)
    snap = _snap(cfg, episode_steps=25)
    s = agent_specific_state(cfg, snap, 2)
    assert s[-1] == 0.25
    assert s[-cfg.n_agents - 1 + 2] == 1.0
