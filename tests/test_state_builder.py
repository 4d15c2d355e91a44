"""SMAC agent-specific state builder tests (synthetic units, no SC2)."""
import ast
import math
import types

import numpy as np
import pytest

from onpolicy_tpu.envs.starcraft2.state_builder import (
    Snapshot, StateConfig, agent_specific_state, all_agent_states,
    all_env_states, env_state, env_state_dim, state_dim)


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


# ---- per-agent EP ("env") state: golden vs the reference source ------
#
# The reference's get_state(agent_id) (StarCraft2_Env.py:1152-1325)
# cannot run without pysc2, but the method itself only touches plain
# attributes and small helpers — so we exec just that method's source
# against a stub object built from the same synthetic Snapshot and
# compare outputs bit-for-bit across flag combinations.

def _load_reference_get_state():
    path = "/root/reference/onpolicy/envs/starcraft2/StarCraft2_Env.py"
    src = open(path).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "get_state":
            seg = ast.get_source_segment(src, node)
            ns = {"np": np, "math": math}
            exec("import numpy as np\n" + seg.replace("self.debug", "False"),
                 ns)
            return ns["get_state"]
    raise AssertionError("get_state not found in reference source")


class _Unit(types.SimpleNamespace):
    pass


def _ref_stub(cfg, snap, obs=None):
    """Stub self for the reference get_state over our Snapshot."""
    s = types.SimpleNamespace()
    for f in ("add_move_state", "add_local_obs", "add_distance_state",
              "add_xy_state", "add_visible_state", "add_enemy_action_state",
              "add_agent_id", "add_center_xy", "use_mustalive",
              "state_last_action", "state_timestep_number"):
        setattr(s, f, getattr(cfg, f))
    s.obs_instead_of_state = False
    s.shield_bits_ally = cfg.shield_bits_ally
    s.shield_bits_enemy = cfg.shield_bits_enemy
    s.unit_type_bits = cfg.unit_type_bits
    s.n_actions = cfg.n_actions
    s.n_agents, s.n_enemies = cfg.n_agents, cfg.n_enemies
    s.map_x, s.map_y = cfg.map_x, cfg.map_y
    s.max_distance_x, s.max_distance_y = cfg.max_distance_x, cfg.max_distance_y
    s.n_actions_move = cfg.n_actions_move
    s.n_actions_no_attack = cfg.n_actions_no_attack
    s.state_pathing_grid = s.state_terrain_height = False
    s.map_type = "none"
    s.medivac_id = -1
    s._episode_steps = snap.episode_steps
    s.episode_limit = cfg.episode_limit
    s.last_action = snap.last_actions

    def unit(i, ally=True):
        if ally:
            return _Unit(pos=_Unit(x=snap.ally_x[i], y=snap.ally_y[i]),
                         health=snap.ally_health[i],
                         health_max=snap.ally_health_max[i],
                         shield=snap.ally_shield[i], unit_type=1000 + i,
                         energy=0.0,
                         weapon_cooldown=snap.ally_cooldown[i])
        return _Unit(pos=_Unit(x=snap.enemy_x[i], y=snap.enemy_y[i]),
                     health=snap.enemy_health[i],
                     health_max=snap.enemy_health_max[i],
                     shield=snap.enemy_shield[i], unit_type=2000 + i)

    s.agents = {i: unit(i) for i in range(cfg.n_agents)}
    s.enemies = {e: unit(e, ally=False) for e in range(cfg.n_enemies)}
    s.get_unit_by_id = lambda i: s.agents[i]
    s.unit_sight_range = lambda i: float(snap.sight_range[i])
    s.get_avail_agent_actions = lambda i: snap.avail_actions[i]
    s.distance = staticmethod(lambda x1, y1, x2, y2: math.hypot(x2 - x1,
                                                                y2 - y1))
    s.unit_max_cooldown = lambda u: float(
        snap.ally_max_cooldown[u.unit_type - 1000])
    s.unit_max_shield = lambda u: float(
        snap.ally_shield_max[u.unit_type - 1000] if u.unit_type < 2000
        else snap.enemy_shield_max[u.unit_type - 2000])
    s.get_unit_type_id = lambda u, ally: int(
        snap.ally_type[u.unit_type - 1000] if ally
        else snap.enemy_type[u.unit_type - 2000])
    s.get_state_move_feats_size = lambda: cfg.n_actions_move
    s.get_obs_agent = lambda i: (obs[i] if obs is not None
                                 else np.zeros(3, np.float32))
    return s


_EP_FLAG_SETS = [
    {},
    {"add_distance_state": True, "add_xy_state": True,
     "add_visible_state": True},
    {"add_enemy_action_state": True, "add_move_state": True,
     "add_agent_id": True},
    {"add_local_obs": True, "state_timestep_number": True},
    {"use_mustalive": False},
    {"add_center_xy": False, "state_last_action": False},
]


@pytest.mark.parametrize("flags", _EP_FLAG_SETS)
def test_env_state_golden_vs_reference(flags):
    ref_get_state = _load_reference_get_state()
    cfg = _cfg(**flags)
    # agent 0 dead exercises the mustalive path; enemy 1 dead stays zero
    snap = _snap(cfg, ally_health=np.array([0.0, 25.0, 100.0]),
                 episode_steps=17)
    obs = np.arange(cfg.n_agents * 3, dtype=np.float32).reshape(
        cfg.n_agents, 3)
    stub = _ref_stub(cfg, snap, obs)
    for agent_id in range(cfg.n_agents):
        ref = np.asarray(ref_get_state(stub, agent_id), np.float32)
        mine = env_state(cfg, snap, agent_id, local_obs=obs[agent_id])
        np.testing.assert_allclose(mine, ref, atol=1e-6,
                                   err_msg=f"agent {agent_id} flags {flags}")
        assert mine.shape == (env_state_dim(cfg, obs_dim=3),)


def test_all_env_states_shape():
    cfg = _cfg(add_local_obs=True)
    snap = _snap(cfg)
    obs = np.zeros((cfg.n_agents, 7), np.float32)
    st = all_env_states(cfg, snap, local_obs=obs)
    assert st.shape == (cfg.n_agents, env_state_dim(cfg, obs_dim=7))
