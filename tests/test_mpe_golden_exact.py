"""EXACT fixed-seed MPE trajectory parity (float64, atol 1e-9).

BASELINE north star: "pure-JAX env trajectories exactly matching the
reference". Two claims, per scenario:

  1. Seeded-reset RNG mapping: `envs/mpe/golden.reference_reset` replays
     the reference's global-np.random draw order, so
     `np.random.seed(s)` → reference reset and golden reset produce
     BIT-IDENTICAL initial worlds (positions + goal draws).
  2. Exact stepping: from that state, 25 steps with identical actions
     keep observations and rewards within 1e-9 in float64
     (`jax_enable_x64`; the engine's trace-time constants are f64 so
     nothing rounds through f32).

x64 flips global jax state, so the check runs in a subprocess.
simple_attack is excluded: the reference's reward function raises
NameError and cannot be executed (see tests/test_mpe_golden2.py).
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, types
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

# reference import shims (tests/test_mpe_golden.py)
import gymnasium
sys.modules.setdefault("gym", gymnasium)
sys.modules.setdefault("seaborn", types.ModuleType("seaborn"))
if "imp" not in sys.modules:
    imp_mod = types.ModuleType("imp")
    def _load_source(name, path):
        import importlib.util
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    imp_mod.load_source = _load_source
    sys.modules["imp"] = imp_mod
sys.path.insert(0, "/root/reference")
from types import SimpleNamespace
from onpolicy.envs.mpe.MPE_env import MPEEnv as RefMPEEnv

from onpolicy_tpu.envs.mpe.env import MPEEnv
from onpolicy_tpu.envs.mpe import golden

CASES = [
    # name, env kwargs, ref args extra, action head sizes
    ("simple_spread", dict(num_agents=3, num_landmarks=3), {}, [(5,)]*3),
    ("simple_reference", dict(num_agents=2, num_landmarks=3), {}, [(5,10)]*2),
    ("simple_speaker_listener", dict(num_agents=2, num_landmarks=3), {},
     [(3,), (5,)]),
    ("simple_adversary", dict(num_agents=3, num_landmarks=2), {}, [(5,)]*3),
    ("simple_tag", dict(num_agents=4, num_landmarks=2,
                        num_good_agents=1, num_adversaries=3),
     dict(num_good_agents=1, num_adversaries=3), [(5,)]*4),
    ("simple_push", dict(num_agents=2, num_landmarks=2), {}, [(5,)]*2),
    ("simple_crypto", dict(num_agents=3, num_landmarks=2), {}, [(4,)]*3),
    ("simple_crypto_display", dict(num_agents=3, num_landmarks=2), {},
     [(4,)]*3),
    ("simple_world_comm", dict(num_agents=6, num_landmarks=1,
                               num_good_agents=2, num_adversaries=4),
     dict(num_good_agents=2, num_adversaries=4), [(5, 4)] + [(5,)]*5),
]

ATOL = 1e-9

def goal_indices(ref, name):
    world = ref.world
    lms = list(world.landmarks)
    if name == "simple_adversary":
        return {"goal": lms.index(world.agents[0].goal_a)}
    if name == "simple_reference":
        return {"goal_b": [lms.index(a.goal_b) for a in world.agents]}
    if name == "simple_speaker_listener":
        return {"goal": lms.index(world.agents[0].goal_b)}
    if name in ("simple_crypto", "simple_crypto_display"):
        return {"goal": lms.index(world.agents[0].goal_a),
                "key": int(np.argmax(world.agents[2].key))}
    if name == "simple_push":
        return {"goal": world.agents[0].goal_a.index}
    return {}

for name, kw, ref_extra, sizes in CASES:
    M = kw["num_agents"]
    args = dict(scenario_name=name, episode_length=25,
                num_agents=M, num_landmarks=kw["num_landmarks"],
                num_good_agents=1, num_adversaries=3)
    args.update(ref_extra)
    ref = RefMPEEnv(SimpleNamespace(**args))
    mine = MPEEnv(name, **kw, episode_length=25)

    for seed in (3, 17):
        np.random.seed(seed)
        ref_obs = ref.reset()
        np.random.seed(seed)
        state = golden.reference_reset(name, mine.spec, dtype=jnp.float64)

        # 1. bit-identical reset
        np.testing.assert_array_equal(
            np.asarray(state.agent_pos),
            np.stack([a.state.p_pos for a in ref.world.agents]),
            err_msg=f"{name} seed {seed}: agent_pos")
        np.testing.assert_array_equal(
            np.asarray(state.landmark_pos),
            np.stack([l.state.p_pos for l in ref.world.landmarks]),
            err_msg=f"{name} seed {seed}: landmark_pos")
        for k2, v in goal_indices(ref, name).items():
            got = np.asarray(state.extras[k2]).tolist()
            assert got == v, (name, seed, k2, got, v)

        # reset observations
        my_obs = mine.scenario.observation(mine.spec, state)
        for i in range(M):
            np.testing.assert_allclose(
                np.asarray(my_obs[i], np.float64), np.asarray(ref_obs[i]),
                rtol=0, atol=ATOL, err_msg=f"{name} seed {seed} reset obs {i}")

        # 2. exact 25-step trajectory
        rng = np.random.default_rng(seed)
        step = jax.jit(mine.step)
        for t in range(25):
            a_idx = np.zeros((M, mine.n_action_heads), np.int64)
            ref_acts = []
            for i, sz in enumerate(sizes):
                segs = []
                for h, n in enumerate(sz):
                    a_idx[i, h] = rng.integers(0, n)
                    oh = np.zeros(n, np.float64)
                    oh[a_idx[i, h]] = 1.0
                    segs.append(oh)
                ref_acts.append(np.concatenate(segs))
            ref_o, ref_r, ref_d, _ = ref.step(ref_acts)
            state, my_o, my_r, my_d = step(state, jnp.asarray(a_idx),
                                           jax.random.PRNGKey(t))
            assert my_o[0].dtype == jnp.float64, my_o[0].dtype
            for i in range(M):
                np.testing.assert_allclose(
                    np.asarray(my_o[i]), np.asarray(ref_o[i], np.float64),
                    rtol=0, atol=ATOL,
                    err_msg=f"{name} seed {seed} step {t} obs {i}")
            np.testing.assert_allclose(
                np.asarray(my_r)[:, 0], np.asarray(ref_r, np.float64)[:, 0],
                rtol=0, atol=ATOL,
                err_msg=f"{name} seed {seed} step {t} rewards")
    print(f"{name}: exact parity ok", flush=True)
print("ALL_EXACT_OK")
"""


@pytest.mark.slow
def test_exact_golden_all_scenarios(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=540)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "ALL_EXACT_OK" in res.stdout
