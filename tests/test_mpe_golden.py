"""Golden-trajectory parity: the pure-JAX MPE engine vs. the reference
numpy implementation (imported from /root/reference with gym/seaborn
shims), stepped from an identical injected initial state with identical
action sequences. This is the BASELINE.md north-star check
("pure-JAX env trajectories exactly matching the reference").
"""
import sys
import types
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onpolicy_tpu.envs.mpe.env import MPEEnv


@pytest.fixture(scope="module")
def reference_mpe():
    """Import the reference MPE with gym→gymnasium + seaborn shims."""
    import gymnasium
    sys.modules.setdefault("gym", gymnasium)
    sys.modules.setdefault("seaborn", types.ModuleType("seaborn"))
    if "imp" not in sys.modules:  # removed in py3.12; reference uses it
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
    try:
        from onpolicy.envs.mpe.MPE_env import MPEEnv as RefMPEEnv
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference MPE not importable: {e}")
    return RefMPEEnv


def _make_ref_env(reference_mpe, scenario, num_agents=3, num_landmarks=3,
                  episode_length=25):
    args = SimpleNamespace(scenario_name=scenario, num_agents=num_agents,
                           num_landmarks=num_landmarks,
                           episode_length=episode_length)
    return reference_mpe(args)


def _inject_state(ref_env, my_env):
    """Copy the reference world's post-reset state into a WorldState."""
    world = ref_env.world
    state, _ = my_env.reset(jax.random.PRNGKey(0))
    return state.replace(
        agent_pos=jnp.array([a.state.p_pos for a in world.agents],
                            jnp.float32),
        agent_vel=jnp.array([a.state.p_vel for a in world.agents],
                            jnp.float32),
        agent_comm=jnp.array([a.state.c for a in world.agents], jnp.float32),
        landmark_pos=jnp.array([l.state.p_pos for l in world.landmarks],
                               jnp.float32),
        landmark_vel=jnp.array([l.state.p_vel for l in world.landmarks],
                               jnp.float32),
        t=jnp.zeros((), jnp.int32),
    )


def _onehot_actions(actions_idx, action_space_sizes):
    """storage-format int actions → reference one-hot lists."""
    out = []
    for i, sizes in enumerate(action_space_sizes):
        segs = []
        for h, n in enumerate(sizes):
            oh = np.zeros(n, np.float32)
            oh[actions_idx[i, h]] = 1.0
            segs.append(oh)
        out.append(np.concatenate(segs))
    return out


@pytest.mark.parametrize("scenario,sizes_fn", [
    ("simple_spread", lambda env: [(5,)] * 3),
    ("simple_reference", lambda env: [(5, 10)] * 2),
])
def test_trajectory_parity(reference_mpe, scenario, sizes_fn):
    num_agents = 3 if scenario == "simple_spread" else 2
    np.random.seed(7)
    ref = _make_ref_env(reference_mpe, scenario, num_agents=num_agents)
    ref_obs = ref.reset()
    mine = MPEEnv(scenario, num_agents, 3, 25)
    state = _inject_state(ref, mine)
    if scenario == "simple_reference":
        # copy goal assignment (reference picks np.random.choice on reset)
        goals = [list(ref.world.landmarks).index(a.goal_b)
                 for a in ref.world.agents]
        state = state.replace(extras={"goal_b": jnp.array(goals)})

    my_obs = mine.env_observation(state) if hasattr(mine, "env_observation") \
        else mine.scenario.observation(mine.spec, state)
    for i in range(num_agents):
        np.testing.assert_allclose(np.asarray(my_obs[i]), ref_obs[i],
                                   atol=1e-5,
                                   err_msg=f"reset obs agent {i}")

    sizes = sizes_fn(ref)
    rng = np.random.default_rng(0)
    step_jit = jax.jit(mine.step)
    for t in range(25):
        heads = mine.n_action_heads
        a_idx = np.zeros((num_agents, heads), np.int64)
        for i, sz in enumerate(sizes):
            for h, n in enumerate(sz):
                a_idx[i, h] = rng.integers(0, n)
        ref_o, ref_r, ref_d, _ = ref.step(_onehot_actions(a_idx, sizes))
        state, my_o, my_r, my_d = step_jit(state, jnp.asarray(a_idx),
                                           jax.random.PRNGKey(t))
        for i in range(num_agents):
            np.testing.assert_allclose(
                np.asarray(my_o[i]), np.asarray(ref_o[i], np.float64),
                atol=2e-3, err_msg=f"step {t} obs agent {i}")
        np.testing.assert_allclose(
            np.asarray(my_r)[:, 0], np.array(ref_r, np.float64)[:, 0],
            atol=2e-3, err_msg=f"step {t} rewards")
        assert bool(my_d) == bool(ref_d[0]), f"step {t} done"


def test_speaker_listener_parity(reference_mpe):
    np.random.seed(11)
    ref = _make_ref_env(reference_mpe, "simple_speaker_listener",
                        num_agents=2)
    ref_obs = ref.reset()
    mine = MPEEnv("simple_speaker_listener", 2, 3, 25)
    state = _inject_state(ref, mine)
    goal = list(ref.world.landmarks).index(ref.world.agents[0].goal_b)
    state = state.replace(extras={"goal": jnp.asarray(goal)})

    my_obs = mine.scenario.observation(mine.spec, state)
    np.testing.assert_allclose(np.asarray(my_obs[0]), ref_obs[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(my_obs[1]), ref_obs[1], atol=1e-5)

    rng = np.random.default_rng(1)
    for t in range(10):
        a_idx = np.array([[rng.integers(0, 3)], [rng.integers(0, 5)]])
        ref_acts = [np.eye(3, dtype=np.float32)[a_idx[0, 0]],
                    np.eye(5, dtype=np.float32)[a_idx[1, 0]]]
        ref_o, ref_r, _, _ = ref.step(ref_acts)
        state, my_o, my_r, _ = mine.step(state, jnp.asarray(a_idx),
                                         jax.random.PRNGKey(t))
        np.testing.assert_allclose(np.asarray(my_o[0]), ref_o[0], atol=2e-3)
        np.testing.assert_allclose(np.asarray(my_o[1]),
                                   np.asarray(ref_o[1], np.float64), atol=2e-3)
        np.testing.assert_allclose(np.asarray(my_r)[:, 0],
                                   np.array(ref_r, np.float64)[:, 0], atol=2e-3)
