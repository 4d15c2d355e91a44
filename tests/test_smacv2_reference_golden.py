"""EXECUTED-reference goldens for the SMACv2 obs/state builders.

The reference's vendored SMACv2 engine
(`/root/reference/onpolicy/envs/starcraft2/StarCraft2v2/starcraft2.py`)
is instantiated via ``__new__`` (no SC2, no smacv2 pip), its units and
capability attributes populated directly, and the REAL `get_obs_agent`
(:1451) / `get_state_agent` (:1696) / `get_avail_agent_actions` (:2359)
execute over randomized snapshots; `v2_builders.agent_obs` /
`agent_state` must match array-for-array.

Covers terran_gen (medivac energy), protoss_gen (shields), zerg_gen,
stochastic attack/health capabilities (observe + zero-pad gating),
enemy masking, dead units, a dead observer, per-unit-type sight ranges
(use_unit_ranges), and the timestep variants.
"""
from __future__ import annotations

import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from onpolicy_tpu.envs.starcraft2 import v2_builders as vb
from onpolicy_tpu.envs.starcraft2.v2_builders import (
    V2Config, config_from_smacv2, snapshot_from_smacv2)


@pytest.fixture(scope="module")
def ref_cls():
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    class _Map:
        pass

    maps_lib = mod("pysc2.maps.lib", Map=_Map)
    mod("pysc2.maps", lib=maps_lib, get=lambda *a, **k: None)
    mod("pysc2.run_configs")
    mod("pysc2.lib.protocol", ProtocolError=type("ProtocolError",
                                                 (Exception,), {}))
    units = mod("pysc2.lib.units",
                Neutral=SimpleNamespace(),
                Protoss=SimpleNamespace(Stalker=74, Zealot=73, Colossus=4),
                Terran=SimpleNamespace(Marine=48, Marauder=51, Medivac=54),
                Zerg=SimpleNamespace(Zergling=105, Hydralisk=107,
                                     Baneling=9))
    mod("pysc2.lib", protocol=sys.modules["pysc2.lib.protocol"],
        units=units)
    mod("pysc2", maps=sys.modules["pysc2.maps"],
        run_configs=sys.modules["pysc2.run_configs"],
        lib=sys.modules["pysc2.lib"])
    diff = {k: i for i, k in enumerate(
        ["VeryEasy", "Easy", "Medium", "MediumHard", "Hard", "Harder",
         "VeryHard", "CheatVision", "CheatMoney", "CheatInsane"])}
    mod("s2clientprotocol.common_pb2", Random=0, Protoss=1, Terran=2, Zerg=3)
    mod("s2clientprotocol.sc2api_pb2", **diff)
    mod("s2clientprotocol.raw_pb2")
    mod("s2clientprotocol.debug_pb2")
    mod("s2clientprotocol",
        common_pb2=sys.modules["s2clientprotocol.common_pb2"],
        sc2api_pb2=sys.modules["s2clientprotocol.sc2api_pb2"],
        raw_pb2=sys.modules["s2clientprotocol.raw_pb2"],
        debug_pb2=sys.modules["s2clientprotocol.debug_pb2"])
    # vendored engine's smacv2-package imports
    mod("smacv2")
    mod("smacv2.env", )
    mod("smacv2.env.multiagentenv", MultiAgentEnv=object)
    mod("smacv2.env.starcraft2", )
    mod("smacv2.env.starcraft2.maps", get_map_params=lambda name: {})

    pkg = types.ModuleType("refsc2v2")
    pkg.__path__ = ["/root/reference/onpolicy/envs/starcraft2/StarCraft2v2"]
    sys.modules.setdefault("refsc2v2", pkg)
    m = importlib.import_module("refsc2v2.starcraft2")
    return m.StarCraft2Env


GEN = {
    "terran_gen": dict(unit_type_bits=3, shield_al=0, shield_en=0,
                       enemy_types=[48, 51, 54]),
    "protoss_gen": dict(unit_type_bits=3, shield_al=1, shield_en=1,
                        enemy_types=[74, 73, 4]),
    "zerg_gen": dict(unit_type_bits=3, shield_al=0, shield_en=0,
                     enemy_types=[105, 107, 9]),
}


def _unit(rng, x, y, health_max, *, shield_max=0.0, unit_type=0, dead=False):
    return SimpleNamespace(
        pos=SimpleNamespace(x=float(x), y=float(y)),
        health=0.0 if dead else float(rng.uniform(0.1, 1.0) * health_max),
        health_max=float(health_max),
        shield=float(rng.uniform(0, shield_max)) if shield_max else 0.0,
        energy=float(rng.uniform(0, 200.0)),
        weapon_cooldown=float(rng.uniform(0, 15.0)),
        unit_type=int(unit_type))


def make_stub(cls, map_type: str, seed: int, *, n_agents=4, n_enemies=4,
              dead_agents=(), dead_enemies=(), **flags):
    p = GEN[map_type]
    rng = np.random.default_rng(seed)
    env = cls.__new__(cls)
    M, E = n_agents, n_enemies
    env.n_agents, env.n_enemies = M, E
    env.n_actions_no_attack = 6
    env.n_actions_move = 4
    env.n_actions = 6 + E
    env.map_x, env.map_y = 32.0, 32.0
    env.max_distance_x, env.max_distance_y = 32.0, 32.0
    env.map_type = map_type
    env.unit_type_bits = p["unit_type_bits"]
    env.shield_bits_ally = p["shield_al"]
    env.shield_bits_enemy = p["shield_en"]
    env.obs_all_health = env.obs_own_health = True
    env.obs_last_action = flags.get("obs_last_action", False)
    env.obs_pathing_grid = env.obs_terrain_height = False
    env.obs_instead_of_state = False
    env.obs_timestep_number = flags.get("obs_timestep_number", False)
    env.obs_starcraft = True
    env.obs_own_pos = flags.get("obs_own_pos", True)
    env.state_last_action = False
    env.state_agent_id = True
    env.state_timestep_number = flags.get("state_timestep_number", False)
    env.fully_observable = False
    env.conic_fov = False
    env.n_fov_actions = 0
    env.use_unit_ranges = True
    env.min_attack_range = 2
    env.debug = False
    env._move_amount = 2
    env.pathing_grid = np.ones((33, 33), dtype=bool)
    env._episode_steps = int(rng.integers(0, 100))
    env.episode_limit = 100
    # capability flags
    env.stochastic_attack = flags.get("stochastic_attack", False)
    env.observe_attack_probs = flags.get("observe_attack_probs", False)
    env.zero_pad_stochastic_attack = flags.get(
        "zero_pad_stochastic_attack", False)
    env.stochastic_health = flags.get("stochastic_health", False)
    env.observe_teammate_health = flags.get("observe_teammate_health", False)
    env.zero_pad_health = flags.get("zero_pad_health", False)
    env.replace_teammates = flags.get("replace_teammates", True)
    env.observe_teammate_types = flags.get("observe_teammate_types", True)
    env.zero_pad_unit_types = flags.get("zero_pad_unit_types", False)
    env.mask_enemies = flags.get("mask_enemies", False)
    env.agent_attack_probabilities = rng.uniform(0.3, 1.0, M)
    env.agent_health_levels = rng.uniform(0.0, 0.5, M)
    env.enemy_mask = rng.integers(0, 2, (M, E)).astype(bool)
    # state attr-name lists (feature-size functions read their lengths)
    env.ally_state_attr_names = ["visible", "distance", "rel_x", "rel_y",
                                 "energy/cooldown", "center_x", "center_y",
                                 "health"] + \
        (["shield"] if env.shield_bits_ally else [])
    env.enemy_state_attr_names = ["available", "distance", "rel_x", "rel_y",
                                  "visible", "center_x", "center_y",
                                  "health"] + \
        (["shield"] if env.shield_bits_enemy else [])
    env.capability_attr_names = []
    if env.stochastic_attack:
        env.capability_attr_names += ["attack_probability"]
    if env.stochastic_health:
        env.capability_attr_names += ["total_health"]
    if env.unit_type_bits:
        bits = [f"type_{b}" for b in range(env.unit_type_bits)]
        env.capability_attr_names += bits
        env.enemy_state_attr_names += bits
    # unit ids — all nine must exist (range maps index by them)
    env._min_unit_type = 100
    if map_type == "terran_gen":
        env.marine_id, env.marauder_id, env.medivac_id = 100, 101, 102
        env.stalker_id, env.zealot_id, env.colossus_id = 200, 201, 202
        env.zergling_id, env.hydralisk_id, env.baneling_id = 300, 301, 302
        ally_pool = [100, 101, 102]
    elif map_type == "protoss_gen":
        env.stalker_id, env.zealot_id, env.colossus_id = 100, 101, 102
        env.marine_id, env.marauder_id, env.medivac_id = 200, 201, 202
        env.zergling_id, env.hydralisk_id, env.baneling_id = 300, 301, 302
        ally_pool = [100, 101, 102]
    else:
        env.zergling_id, env.hydralisk_id, env.baneling_id = 100, 101, 102
        env.marine_id, env.marauder_id, env.medivac_id = 200, 201, 202
        env.stalker_id, env.zealot_id, env.colossus_id = 300, 301, 302
        ally_pool = [100, 101, 102]

    shield_max = 80.0 if p["shield_al"] else 0.0
    env.agents = {}
    for i in range(M):
        x, y = rng.uniform(2, 30, size=2)
        env.agents[i] = _unit(rng, x, y, rng.uniform(40, 150),
                              shield_max=shield_max,
                              unit_type=int(rng.choice(ally_pool)),
                              dead=i in dead_agents)
    if map_type == "terran_gen" and not dead_agents:
        env.agents[M - 1].unit_type = env.medivac_id   # ensure a medivac
    env.enemies = {}
    for e in range(E):
        x, y = rng.uniform(2, 30, size=2)
        env.enemies[e] = _unit(rng, x, y, rng.uniform(40, 150),
                               shield_max=80.0 if p["shield_en"] else 0.0,
                               unit_type=int(rng.choice(p["enemy_types"])),
                               dead=e in dead_enemies)
    la = np.zeros((M, env.n_actions), np.float32)
    la[np.arange(M), rng.integers(0, env.n_actions, size=M)] = 1.0
    env.last_action = la
    return env


CASES = [
    ("terran_gen", 0, {}),
    ("terran_gen", 1, dict(dead_agents=(1,), dead_enemies=(0, 2))),
    ("terran_gen", 2, dict(dead_agents=(0,))),            # dead observer
    ("protoss_gen", 3, {}),
    ("protoss_gen", 4, dict(dead_agents=(2,), dead_enemies=(3,))),
    ("zerg_gen", 5, {}),
    ("terran_gen", 6, dict(stochastic_attack=True,
                           observe_attack_probs=True)),
    ("terran_gen", 7, dict(stochastic_attack=True,
                           zero_pad_stochastic_attack=True)),
    ("zerg_gen", 8, dict(stochastic_health=True,
                         observe_teammate_health=True)),
    ("zerg_gen", 9, dict(stochastic_health=True, zero_pad_health=True)),
    ("protoss_gen", 10, dict(mask_enemies=True)),
    ("terran_gen", 11, dict(replace_teammates=True,
                            observe_teammate_types=False,
                            zero_pad_unit_types=True)),
    ("terran_gen", 12, dict(obs_last_action=True)),       # obs path only
    ("zerg_gen", 13, dict(obs_timestep_number=True,
                          state_timestep_number=True)),
]
IDS = [f"{m}-s{s}" for m, s, _ in CASES]


@pytest.mark.parametrize("map_type,seed,flags", CASES, ids=IDS)
def test_v2_obs_matches_executed_reference(ref_cls, map_type, seed, flags):
    kw = dict(flags)
    dead_a = kw.pop("dead_agents", ())
    dead_e = kw.pop("dead_enemies", ())
    env = make_stub(ref_cls, map_type, seed, dead_agents=dead_a,
                    dead_enemies=dead_e, **kw)
    cfg = config_from_smacv2(env)
    snap = snapshot_from_smacv2(env)
    assert vb.obs_dim(cfg) == env.get_obs_size()[0]
    for i in range(env.n_agents):
        ref = np.asarray(env.get_obs_agent(i), np.float32)
        ours = vb.agent_obs(cfg, snap, i)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")


@pytest.mark.parametrize("map_type,seed,flags", CASES, ids=IDS)
def test_v2_state_matches_executed_reference(ref_cls, map_type, seed, flags):
    kw = dict(flags)
    dead_a = kw.pop("dead_agents", ())
    dead_e = kw.pop("dead_enemies", ())
    if kw.get("obs_last_action"):
        pytest.skip("latent reference bug: state rows reserve no "
                    "last-action space (v2_builders rejects it)")
    env = make_stub(ref_cls, map_type, seed, dead_agents=dead_a,
                    dead_enemies=dead_e, **kw)
    cfg = config_from_smacv2(env)
    snap = snapshot_from_smacv2(env)
    for i in range(env.n_agents):
        ref = np.asarray(env.get_state_agent(i), np.float32)
        ours = vb.agent_state(cfg, snap, i)
        assert ours.shape == ref.shape, f"agent {i}"
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")
    assert vb.state_dim(cfg) == len(env.get_state_agent(0))


def test_v2_avail_actions_unit_ranges(ref_cls):
    """Executed get_avail_agent_actions with use_unit_ranges: shoot
    range per type (min_attack_range floor), medivac heals allies."""
    env = make_stub(ref_cls, "terran_gen", 20)
    snap = snapshot_from_smacv2(env)
    av = snap.avail_actions
    assert av.shape == (env.n_agents, env.n_actions)
    for i in range(env.n_agents):
        assert av[i, 0] == 0 and av[i, 1] == 1
    # the guaranteed medivac: attack slots reflect ALLY targets
    med = env.n_agents - 1
    assert env.agents[med].unit_type == env.medivac_id
    shoot = max(4, env.min_attack_range)
    for e in range(env.n_enemies):
        t = env.agents[e] if e < env.n_agents else None
    # non-medivacs target enemies within per-type shoot range
    a0 = env.agents[0]
    r0 = {100: 5, 101: 6, 102: 4}[a0.unit_type]
    r0 = max(r0, env.min_attack_range)
    for e, u in env.enemies.items():
        d = np.hypot(u.pos.x - a0.pos.x, u.pos.y - a0.pos.y)
        expect = 1.0 if (u.health > 0 and d <= r0) else 0.0
        assert av[0, 6 + e] == expect


def test_state_rejects_last_action():
    cfg = V2Config(n_agents=3, n_enemies=3, n_actions=9, map_x=32,
                   map_y=32, max_distance_x=32, max_distance_y=32,
                   obs_last_action=True)
    snap = None
    with pytest.raises(ValueError, match="latent reference bug"):
        vb.agent_state(cfg, snap, 0)
