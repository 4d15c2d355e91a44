"""SMACv2 adapter semantics (stubbed engine, no SC2).

Covers the SMACv2_modified deltas (`/root/reference/onpolicy/envs/
starcraft2/SMACv2_modified.py:32-52`): per-agent dones from
death_tracker_ally, agent-specific state via the state builder, and the
enriched info dict (battles_draw/restarts/won/bad_transition).
"""
import sys
import types

import numpy as np
import pytest


class _FakeInner:
    """Minimal stand-in for smacv2's StarCraft2Env."""

    def __init__(self, M=3, E=2, A=8):
        self.n_agents, self.n_enemies, self.n_actions = M, E, A
        self.map_x = self.map_y = 32
        self.max_distance_x = self.max_distance_y = 32
        self.unit_type_bits = 0
        self.shield_bits_ally = self.shield_bits_enemy = 0
        self.obs_all_health = self.obs_own_health = True
        self.state_last_action = True
        # v2-engine flags read by v2_builders.config_from_smacv2
        self.obs_last_action = False
        self.obs_timestep_number = False
        self.state_timestep_number = False
        self.obs_own_pos = True
        self.episode_limit = 5
        self.battles_won, self.battles_game = 1, 2
        self.timeouts, self.force_restarts = 3, 4
        self.win_counted = True
        self._episode_steps = 0
        self.death_tracker_ally = np.array([0.0, 1.0, 0.0])
        self.last_action = np.zeros((M, A), np.float32)
        self.map_type = "none"
        self.medivac_id = -1
        self.agents = {}
        self.enemies = {e: types.SimpleNamespace(
            pos=types.SimpleNamespace(x=1.0 * e, y=0.0), health=1.0,
            health_max=1.0, shield=0.0, unit_type=0) for e in range(E)}
        for i in range(M):
            self.agents[i] = types.SimpleNamespace(
                pos=types.SimpleNamespace(x=1.0 * i, y=1.0), health=1.0,
                health_max=1.0, shield=0.0, unit_type=0, energy=0.0,
                weapon_cooldown=0.5)

    def get_unit_by_id(self, i):
        return self.agents[i]

    def unit_sight_range(self, i):
        return 9.0

    def unit_max_cooldown(self, u):
        return 10.0

    def unit_max_shield(self, u):
        return 0.0

    def get_unit_type_id(self, u, ally):
        return 0

    def get_avail_actions(self):
        return np.ones((self.n_agents, self.n_actions), np.float32)


class _FakeWrapper:
    def __init__(self, capability_config=None, map_name=None, **kw):
        self.env = _FakeInner()

    def get_env_info(self):
        return {"n_agents": 3, "n_actions": 8, "episode_limit": 5,
                "obs_shape": 4, "state_shape": 10}

    def get_obs(self):
        return np.zeros((3, 4), np.float32)

    def get_avail_actions(self):
        return np.ones((3, 8), np.float32)

    def get_state(self):
        return np.zeros(10, np.float32)

    def reset(self):
        return None

    def step(self, actions):
        self.env._episode_steps += 1
        return 1.5, False, {}

    def close(self):
        pass


@pytest.fixture()
def smacv2_env(monkeypatch):
    mod = types.ModuleType("smacv2.env")
    mod.StarCraftCapabilityEnvWrapper = _FakeWrapper
    pkg = types.ModuleType("smacv2")
    pkg.env = mod
    monkeypatch.setitem(sys.modules, "smacv2", pkg)
    monkeypatch.setitem(sys.modules, "smacv2.env", mod)
    from onpolicy_tpu.envs.starcraft2.smacv2_env import SMACv2Env
    return SMACv2Env


def test_modified_semantics(smacv2_env):
    env = smacv2_env("10gen_protoss", {}, state_type="agent_feature",
                     per_agent_dones=True)
    obs, share, avail = env.reset()
    from onpolicy_tpu.envs.starcraft2 import v2_builders as sb
    assert share.shape == (3, sb.state_dim(env._sb_cfg))
    assert env.share_observation_space[0].shape == (share.shape[1],)
    obs, share, rew, dones, infos, avail = env.step(np.zeros((3, 1)))
    # agent 1 dead per death_tracker_ally, env not terminated
    assert list(dones) == [False, True, False]
    assert infos[0]["battles_draw"] == 3 and infos[0]["restarts"] == 4
    assert infos[0]["won"] is True
    assert rew.shape == (3, 1) and float(rew[0, 0]) == 1.5


def test_plain_semantics(smacv2_env):
    env = smacv2_env("10gen_protoss", {}, state_type="env",
                     per_agent_dones=False)
    obs, share, avail = env.reset()
    assert share.shape == (3, 10)
    obs, share, rew, dones, infos, avail = env.step(np.zeros((3, 1)))
    assert not dones.any()          # scalar-done semantics (SMACv2.py:37)


def test_bad_transition_on_limit(smacv2_env):
    env = smacv2_env("10gen_protoss", {}, state_type="env")
    env.reset()
    for _ in range(5):
        *_, infos, _ = env.step(np.zeros((3, 1)))
    assert infos[0]["bad_transition"] is True
