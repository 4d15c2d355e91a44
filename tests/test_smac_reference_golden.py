"""EXECUTED-reference goldens for the SMAC obs/state builders.

Round-2 VERDICT item 2: the stub-golden tests
(tests/test_obs_builder.py / test_state_builder.py) pin the builders
against hand-transcribed vectors; here the actual reference methods
(`/root/reference/onpolicy/envs/starcraft2/StarCraft2_Env.py:978-1142`
`get_obs_agent`, `:1327-1521` `get_state_agent`, `:1152-1325`
`get_state`) are EXECUTED on a stub instance (``__new__``-constructed,
no SC2 binary, units/attrs populated directly) over randomized
snapshots, and our pure-array builders must match array-for-array.

`get_avail_agent_actions` (`:1809-1853`) also runs for real (all-passable
pathing grid) and feeds both sides identically, exactly as a live smac
engine would feed `snapshot_from_smac`.

Covered: marines (no shields/types), stalkers_and_zealots (shields +
2 type bits), MMM (3 type bits + medivac energy-as-cooldown), dead
units on both sides, a dead observing agent (mustalive zeroing), the
dist==sight_range edge (strict <), timestep-number variants, and the
EP-state ablation blocks (distance/xy/visible/enemy-action/move/
agent-id).
"""
from __future__ import annotations

import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from onpolicy_tpu.envs.starcraft2 import obs_builder as ob
from onpolicy_tpu.envs.starcraft2 import state_builder as sb
from onpolicy_tpu.envs.starcraft2.state_builder import (
    Snapshot, StateConfig, snapshot_from_smac)


# ---------------------------------------------------------------------------
# Reference import: synthetic package over the reference starcraft2 dir
# (avoids onpolicy/__init__ pulling torch/runner/scripts) with pysc2 /
# s2clientprotocol shims — only module-level names are needed; no SC2.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_cls():
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    class _Map:  # pysc2.maps.lib.Map stand-in for SMACMap subclassing
        pass

    maps_lib = mod("pysc2.maps.lib", Map=_Map)
    mod("pysc2.maps", lib=maps_lib, get=lambda *a, **k: None)
    mod("pysc2.run_configs")
    mod("pysc2.lib.protocol", ProtocolError=type("ProtocolError",
                                                 (Exception,), {}))
    mod("pysc2.lib", protocol=sys.modules["pysc2.lib.protocol"])
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
    import gymnasium
    sys.modules.setdefault("gym", gymnasium)

    pkg = types.ModuleType("refsc2")
    pkg.__path__ = ["/root/reference/onpolicy/envs/starcraft2"]
    sys.modules.setdefault("refsc2", pkg)
    m = importlib.import_module("refsc2.StarCraft2_Env")
    return m.StarCraft2Env


SCENARIOS = {
    # map_type-keyed presets mirroring smac_maps.py entries
    "marines": dict(n_agents=5, n_enemies=6, unit_type_bits=0,
                    shield_bits_ally=0, shield_bits_enemy=0,
                    map_type="marines"),
    "stalkers_and_zealots": dict(n_agents=4, n_enemies=5, unit_type_bits=2,
                                 shield_bits_ally=1, shield_bits_enemy=1,
                                 map_type="stalkers_and_zealots"),
    "MMM": dict(n_agents=5, n_enemies=4, unit_type_bits=3,
                shield_bits_ally=0, shield_bits_enemy=0, map_type="MMM"),
}


def _unit(rng, x, y, health_max, *, shield_max=0.0, unit_type=0,
          max_cd=15.0, dead=False):
    health = 0.0 if dead else float(rng.uniform(0.05, 1.0) * health_max)
    return SimpleNamespace(
        pos=SimpleNamespace(x=float(x), y=float(y)),
        health=health, health_max=float(health_max),
        shield=float(rng.uniform(0, shield_max)) if shield_max else 0.0,
        energy=float(rng.uniform(0, 200.0)),
        weapon_cooldown=float(rng.uniform(0, max_cd)),
        unit_type=int(unit_type))


def make_stub(cls, scenario: str, seed: int, *, dead_agents=(),
              dead_enemies=(), obs_timestep_number=False,
              state_timestep_number=False, **extra_flags):
    """A reference StarCraft2Env with __init__ bypassed and every attr
    its obs/state/avail methods read populated directly."""
    p = SCENARIOS[scenario]
    rng = np.random.default_rng(seed)
    env = cls.__new__(cls)
    M, E = p["n_agents"], p["n_enemies"]
    env.n_agents, env.n_enemies = M, E
    env.n_actions_no_attack = 6
    env.n_actions_move = 4
    env.n_actions = 6 + E
    env.map_x, env.map_y = 32.0, 32.0
    env.max_distance_x, env.max_distance_y = 32.0, 32.0
    env.map_type = p["map_type"]
    env.unit_type_bits = p["unit_type_bits"]
    env.shield_bits_ally = p["shield_bits_ally"]
    env.shield_bits_enemy = p["shield_bits_enemy"]
    env.obs_all_health = env.obs_own_health = True
    env.obs_last_action = True
    env.obs_agent_id = True
    env.obs_pathing_grid = env.obs_terrain_height = False
    env.obs_instead_of_state = False
    env.obs_timestep_number = obs_timestep_number
    env.state_pathing_grid = env.state_terrain_height = False
    env.state_last_action = True
    env.state_agent_id = True
    env.state_timestep_number = state_timestep_number
    env.add_center_xy = True
    env.use_mustalive = True
    for f in ("add_move_state", "add_local_obs", "add_distance_state",
              "add_xy_state", "add_visible_state", "add_enemy_action_state",
              "add_agent_id"):
        setattr(env, f, extra_flags.get(f, False))
    env.stacked_frames = 1
    env.use_stacked_frames = False
    env.debug = False
    env._move_amount = 2
    env.pathing_grid = np.ones((33, 33), dtype=bool)
    env._episode_steps = int(rng.integers(0, 120))
    env.episode_limit = 120
    # unit-type ids (unit_max_cooldown switcher + get_unit_type_id)
    env._min_unit_type = 100
    env.marine_id, env.marauder_id, env.medivac_id = 100, 101, 102
    env.stalker_id, env.zealot_id, env.colossus_id = 74, 73, 4
    env.hydralisk_id, env.zergling_id, env.baneling_id = 9, 105, 106

    if scenario == "marines":
        ally_types = [env.marine_id] * M
        enemy_types = [48] * E
        shield_max = 0.0
    elif scenario == "stalkers_and_zealots":
        # ally new-SC2 types offset from _min_unit_type; enemies 73/74
        ally_types = [100 + int(rng.integers(0, 2)) for _ in range(M)]
        env.stalker_id, env.zealot_id = 100, 101  # max_shield via ally ids
        enemy_types = [int(rng.choice([73, 74])) for _ in range(E)]
        shield_max = 80.0
    else:  # MMM: marine/marauder/medivac allies, enemies 51/48/54
        ally_types = [100 + int(rng.integers(0, 3)) for _ in range(M)]
        ally_types[-1] = env.medivac_id  # guarantee one medivac
        enemy_types = [int(rng.choice([51, 48, 54])) for _ in range(E)]
        shield_max = 0.0

    env.agents = {}
    for i in range(M):
        x, y = rng.uniform(2, 30, size=2)
        env.agents[i] = _unit(rng, x, y, rng.uniform(40, 150),
                              shield_max=shield_max, unit_type=ally_types[i],
                              dead=i in dead_agents)
    # dist == sight_range edge case: agent1 exactly 9.0 east of agent0
    if 0 not in dead_agents and 1 not in dead_agents and M >= 2:
        env.agents[1].pos.x = env.agents[0].pos.x
        env.agents[1].pos.y = min(env.agents[0].pos.y + 9.0, 31.0)
    env.enemies = {}
    for e in range(E):
        x, y = rng.uniform(2, 30, size=2)
        env.enemies[e] = _unit(rng, x, y, rng.uniform(40, 150),
                               shield_max=shield_max,
                               unit_type=enemy_types[e],
                               dead=e in dead_enemies)
    la = np.zeros((M, env.n_actions), np.float32)
    la[np.arange(M), rng.integers(0, env.n_actions, size=M)] = 1.0
    env.last_action = la
    return env


def _cfg_from_stub(env) -> StateConfig:
    return StateConfig(
        n_agents=env.n_agents, n_enemies=env.n_enemies,
        n_actions=env.n_actions, map_x=env.map_x, map_y=env.map_y,
        max_distance_x=env.max_distance_x, max_distance_y=env.max_distance_y,
        unit_type_bits=env.unit_type_bits,
        shield_bits_ally=env.shield_bits_ally,
        shield_bits_enemy=env.shield_bits_enemy,
        obs_all_health=env.obs_all_health, obs_own_health=env.obs_own_health,
        obs_last_action=env.obs_last_action, obs_agent_id=env.obs_agent_id,
        obs_timestep_number=env.obs_timestep_number,
        add_center_xy=env.add_center_xy,
        state_last_action=env.state_last_action,
        state_agent_id=env.state_agent_id,
        state_timestep_number=env.state_timestep_number,
        use_mustalive=env.use_mustalive,
        episode_limit=env.episode_limit,
        add_move_state=env.add_move_state, add_local_obs=env.add_local_obs,
        add_distance_state=env.add_distance_state,
        add_xy_state=env.add_xy_state,
        add_visible_state=env.add_visible_state,
        add_enemy_action_state=env.add_enemy_action_state,
        add_agent_id=env.add_agent_id)


CASES = [
    ("marines", 0, (), ()),
    ("marines", 1, (2,), (0, 3)),          # dead ally + dead enemies
    ("marines", 2, (0,), ()),              # dead OBSERVING agent
    ("stalkers_and_zealots", 3, (), ()),
    ("stalkers_and_zealots", 4, (1, 3), (2,)),
    ("MMM", 5, (), ()),
    ("MMM", 6, (4,), (1,)),                # dead medivac
]


@pytest.mark.parametrize("scenario,seed,dead_a,dead_e",
                         CASES, ids=[f"{c[0]}-s{c[1]}" for c in CASES])
def test_obs_agent_matches_executed_reference(ref_cls, scenario, seed,
                                              dead_a, dead_e):
    env = make_stub(ref_cls, scenario, seed, dead_agents=dead_a,
                    dead_enemies=dead_e)
    cfg = _cfg_from_stub(env)
    snap = snapshot_from_smac(env)
    assert ob.obs_dim(cfg) == len(env.get_obs_agent(0))
    for i in range(env.n_agents):
        ref = np.asarray(env.get_obs_agent(i), np.float32)
        ours = ob.agent_obs(cfg, snap, i)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")


@pytest.mark.parametrize("scenario,seed,dead_a,dead_e",
                         CASES, ids=[f"{c[0]}-s{c[1]}" for c in CASES])
def test_state_agent_matches_executed_reference(ref_cls, scenario, seed,
                                               dead_a, dead_e):
    env = make_stub(ref_cls, scenario, seed, dead_agents=dead_a,
                    dead_enemies=dead_e)
    cfg = _cfg_from_stub(env)
    snap = snapshot_from_smac(env)
    assert sb.state_dim(cfg) == len(env.get_state_agent(0))
    for i in range(env.n_agents):
        ref = np.asarray(env.get_state_agent(i), np.float32)
        ours = sb.agent_specific_state(cfg, snap, i)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")


@pytest.mark.parametrize("scenario,seed,dead_a,dead_e",
                         CASES, ids=[f"{c[0]}-s{c[1]}" for c in CASES])
def test_env_state_matches_executed_reference(ref_cls, scenario, seed,
                                              dead_a, dead_e):
    env = make_stub(ref_cls, scenario, seed, dead_agents=dead_a,
                    dead_enemies=dead_e)
    cfg = _cfg_from_stub(env)
    snap = snapshot_from_smac(env)
    for i in range(env.n_agents):
        ref = np.asarray(env.get_state(i), np.float32)
        ours = sb.env_state(cfg, snap, i)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")


def test_timestep_number_variants(ref_cls):
    env = make_stub(ref_cls, "stalkers_and_zealots", 7,
                    obs_timestep_number=True, state_timestep_number=True)
    cfg = _cfg_from_stub(env)
    snap = snapshot_from_smac(env)
    for i in range(env.n_agents):
        np.testing.assert_allclose(
            ob.agent_obs(cfg, snap, i),
            np.asarray(env.get_obs_agent(i), np.float32), atol=1e-6)
        np.testing.assert_allclose(
            sb.agent_specific_state(cfg, snap, i),
            np.asarray(env.get_state_agent(i), np.float32), atol=1e-6)


def test_env_state_ablation_blocks(ref_cls):
    """EP-state with every agent-relative ablation block switched on
    (`train_smac.py:112-118` flags; `get_state`:1246-1302)."""
    flags = dict(add_move_state=True, add_distance_state=True,
                 add_xy_state=True, add_visible_state=True,
                 add_enemy_action_state=True, add_agent_id=True)
    env = make_stub(ref_cls, "MMM", 8, dead_enemies=(2,), **flags)
    cfg = _cfg_from_stub(env)
    snap = snapshot_from_smac(env)
    for i in range(env.n_agents):
        ref = np.asarray(env.get_state(i), np.float32)
        ours = sb.env_state(cfg, snap, i)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"agent {i}")


def test_avail_actions_executed_reference(ref_cls):
    """snapshot avail_actions comes from the REAL get_avail_agent_actions
    — dead agents get the no-op-only row (`:1851-1853`), shoot range 6
    gating with <=, medivac heal targets on MMM (`:1831-1838`)."""
    env = make_stub(ref_cls, "MMM", 9, dead_agents=(1,))
    snap = snapshot_from_smac(env)
    av = snap.avail_actions
    assert av.shape == (env.n_agents, env.n_actions)
    np.testing.assert_array_equal(
        av[1], [1] + [0] * (env.n_actions - 1))   # dead → no-op only
    for i in range(env.n_agents):
        if i == 1:
            continue
        assert av[i, 0] == 0 and av[i, 1] == 1    # alive: no-op off, stop on


# ---------------------------------------------------------------------------
# Round-5 VERDICT item 8: the last two delegated behaviors — last-action
# TRACKING across reset/steps, and the stacked-frames path — pinned by
# executing the reference's own code (methods for obs/state; the inline
# bookkeeping blocks extracted verbatim from the reference source and
# exec'd, so line drift cannot silently detach the golden).
# ---------------------------------------------------------------------------

def _extract_block(fn, marker):
    """The verbatim suite of the reference source line containing
    `marker` (the line plus its indented block), dedented for exec."""
    import inspect
    import textwrap
    lines = textwrap.dedent(inspect.getsource(fn)).splitlines()
    i = next(k for k, l in enumerate(lines) if marker in l)
    indent = len(lines[i]) - len(lines[i].lstrip())
    block = [lines[i]]
    for l in lines[i + 1:]:
        if l.strip() and (len(l) - len(l.lstrip())) <= indent:
            break
        block.append(l)
    return textwrap.dedent("\n".join(block))


def test_last_action_tracking_executed_reference(ref_cls):
    """Tracking dynamics (`StarCraft2_Env.py:400` reset zeroing, `:464`
    one-hot bookkeeping at step): execute the reference's own lines on
    the stub across a reset + 3 steps, re-running the real
    get_obs_agent/get_state_agent after every update; our snapshot
    update (eye[actions], the contract snapshot_from_smac relies on the
    live engine for) must reproduce obs AND state array-for-array."""
    env = make_stub(ref_cls, "stalkers_and_zealots", 11)
    cfg = _cfg_from_stub(env)
    reset_line = _extract_block(ref_cls.reset, "self.last_action = np.zeros")
    step_line = _extract_block(ref_cls.step, "self.last_action = np.eye")
    rng = np.random.default_rng(0)

    def check():
        snap = snapshot_from_smac(env)   # forwards env.last_action
        for i in range(env.n_agents):
            np.testing.assert_allclose(
                ob.agent_obs(cfg, snap, i),
                np.asarray(env.get_obs_agent(i), np.float32), atol=1e-6)
            np.testing.assert_allclose(
                sb.agent_specific_state(cfg, snap, i),
                np.asarray(env.get_state_agent(i), np.float32), atol=1e-6)

    exec(reset_line, {"np": np}, {"self": env})
    assert (env.last_action == 0).all()
    check()
    for _ in range(3):
        actions_int = [int(a) for a in
                       rng.integers(0, env.n_actions, env.n_agents)]
        exec(step_line, {"np": np},
             {"self": env, "actions_int": actions_int})
        np.testing.assert_array_equal(
            env.last_action, np.eye(env.n_actions)[np.array(actions_int)])
        check()


def test_stacked_frames_executed_reference(ref_cls):
    """Stacked-frames path (`StarCraft2_Env.py:325-327` zero-init once,
    `:427-435` reset pushes, `:605-613` roll(+1)+write-at-[-1], never
    cleared): execute the reference's own stacked block over a
    random frame sequence spanning an episode boundary; the
    StackedFrames wrapper must match bit-for-bit."""
    from onpolicy_tpu.envs.wrappers import StackedFrames
    from onpolicy_tpu.utils import spaces as sp

    M, K, DO, DS, T = 3, 4, 5, 7, 6
    rng = np.random.default_rng(3)
    frames = [(rng.normal(size=(M, DO)).astype(np.float32),
               rng.normal(size=(M, DS)).astype(np.float32))
              for _ in range(2 * T + 2)]

    # --- reference side: init (:325-327) + the step block (:605-613,
    # identical to the reset block :427-435) executed verbatim ---
    env = make_stub(ref_cls, "marines", 0)
    env.use_stacked_frames = True
    env.stacked_frames = K
    env.n_agents = M
    env.stacked_local_obs = np.zeros((M, K, DO), dtype=np.float32)
    env.stacked_global_state = np.zeros((M, K, DS), dtype=np.float32)
    block = _extract_block(ref_cls.step, "if self.use_stacked_frames:")

    def ref_push(lo, gs):
        ns = {"self": env, "local_obs": lo, "global_state": gs}
        exec(block, {"np": np}, ns)
        return ns["local_obs"], ns["global_state"]

    # --- our side: the wrapper over a scripted share-protocol env ---
    class Scripted:
        def __init__(self):
            self.num_agents = M
            self.observation_space = [sp.Box((DO,))] * M
            self.share_observation_space = [sp.Box((DS,))] * M
            self.action_space = [sp.Discrete(4)] * M
            self.t = -1

        def reset(self):
            self.t += 1
            o, s = frames[self.t]
            return o, s, np.ones((M, 4), np.float32)

        def step(self, a):
            self.t += 1
            o, s = frames[self.t]
            done = np.full(M, self.t % T == T - 1)
            return o, s, np.zeros((M, 1), np.float32), done, [{}] * M, \
                np.ones((M, 4), np.float32)

        def close(self):
            pass

    wrapped = StackedFrames(Scripted(), k=K)
    t = 0
    o, s, _ = wrapped.reset()
    ro, rs = ref_push(*frames[t])
    np.testing.assert_array_equal(o, ro)
    np.testing.assert_array_equal(s, rs)
    for ep in range(2):
        for _ in range(T - 1 if ep == 0 else T):
            t += 1
            o, s, *_ = wrapped.step(np.zeros((M, 1)))
            ro, rs = ref_push(*frames[t])
            np.testing.assert_array_equal(o, ro)
            np.testing.assert_array_equal(s, rs)
        # episode boundary: reference reset() pushes without clearing
        t += 1
        o, s, _ = wrapped.reset()
        ro, rs = ref_push(*frames[t])
        np.testing.assert_array_equal(o, ro)
        np.testing.assert_array_equal(s, rs)
