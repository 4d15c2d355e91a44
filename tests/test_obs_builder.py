"""Stub-golden tests for the SMAC observation builder.

Hand-computed expected vectors transcribed from the reference
`get_obs_agent` (`StarCraft2_Env.py:978-1142`) over synthetic units —
the same technique as tests/test_state_builder.py, pinning the obs
contract (block order, sight gating, dead-unit zeroing, agent-id /
last-action handling) without an SC2 install.
"""
import numpy as np

from onpolicy_tpu.envs.starcraft2 import obs_builder as ob
from tests.test_state_builder import _cfg, _snap


def test_obs_dim():
    cfg = _cfg()
    # nf_al = 4 + 2(type) + 2(health+shield) + 8(last act) = 16, ×2 allies
    # nf_en = 4 + 2 + 2 = 8, ×2 enemies; move 4; own 16; agent-id 3
    assert ob.obs_dim(cfg) == 2 * 16 + 2 * 8 + 4 + 16 + 3
    cfg2 = _cfg(obs_last_action=False, obs_agent_id=False)
    assert ob.obs_dim(cfg2) == 2 * 8 + 2 * 8 + 4 + 8
    cfg3 = _cfg(obs_timestep_number=True)
    assert ob.obs_dim(cfg3) == ob.obs_dim(cfg) + 1


def test_agent0_obs_hand_computed():
    cfg = _cfg()
    snap = _snap(cfg)
    o = ob.agent_obs(cfg, snap, 0)
    sr = 9.0
    la = np.eye(3, 8, dtype=np.float32)

    # ally block: agent1 visible (dist 2), agent2 out of sight (dist 10)
    ally1 = np.concatenate([
        [1.0, 2 / sr, 2 / sr, 0.0, 25 / 100, 0 / 20, 0, 1], la[1]])
    ally2 = np.zeros(16, np.float32)
    # enemy block: enemy0 visible (dist 1), enemy1 dead
    enemy0 = np.array([1.0, 1 / sr, 1 / sr, 0.0, 80 / 100, 20 / 40, 0, 1],
                      np.float32)
    enemy1 = np.zeros(8, np.float32)
    move = np.ones(4, np.float32)                 # avail[2:6] all ones
    own = np.concatenate([[1, 0, 0, 0, 50 / 100, 10 / 20, 1, 0], la[0]])
    agent_id = np.array([1, 0, 0], np.float32)

    expected = np.concatenate([ally1, ally2, enemy0, enemy1, move, own,
                               agent_id]).astype(np.float32)
    np.testing.assert_allclose(o, expected, atol=1e-6)


def test_sight_gating_and_availability():
    cfg = _cfg()
    # agent 2 at (20,10): enemy0 at (11,10) dist 9 == sight → NOT visible
    # (strict <, `:1040`); enemy1 dead; allies at dist 10 and 8
    snap = _snap(cfg)
    o = ob.agent_obs(cfg, snap, 2)
    ally = o[:32].reshape(2, 16)
    assert ally[0].sum() == 0                      # agent0, dist 10 > 9
    assert ally[1][0] == 1                         # agent1, dist 8 < 9
    enemy = o[32:48].reshape(2, 8)
    assert enemy.sum() == 0                        # dist 9 not < 9; dead

    # attack availability flows into enemy_feats[:, 0]
    snap2 = _snap(cfg)
    snap2.avail_actions[0, 6] = 0.0                # enemy0 not attackable
    o0 = ob.agent_obs(cfg, snap2, 0)
    enemy0 = o0[32:40]
    assert enemy0[0] == 0.0 and enemy0[1] > 0      # visible but unavailable


def test_dead_agent_zeros_except_id():
    cfg = _cfg(obs_timestep_number=True)
    snap = _snap(cfg, ally_health=np.array([0.0, 25.0, 100.0]),
                 episode_steps=100)
    o = ob.agent_obs(cfg, snap, 0)
    d = ob.obs_dim(cfg)
    assert o.shape == (d,)
    assert np.all(o[:-4] == 0)                     # features all zero
    np.testing.assert_allclose(o[-4:-1], [1, 0, 0])  # id one-hot still set
    assert o[-1] == np.float32(100 / cfg.episode_limit)


def test_no_last_action_no_agent_id_layout():
    cfg = _cfg(obs_last_action=False, obs_agent_id=False)
    snap = _snap(cfg)
    o = ob.agent_obs(cfg, snap, 0)
    sr = 9.0
    ally1 = np.array([1.0, 2 / sr, 2 / sr, 0.0, 0.25, 0.0, 0, 1], np.float32)
    np.testing.assert_allclose(o[:8], ally1, atol=1e-6)
    own = o[2 * 8 + 2 * 8 + 4:]
    np.testing.assert_allclose(own, [1, 0, 0, 0, 0.5, 0.5, 1, 0], atol=1e-6)
