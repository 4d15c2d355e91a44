"""Sharded-mesh consistency: the same episode program on a 1-device vs
4-device data-sharded mesh must produce (numerically) the same updates —
validating that sharding annotations change layout, not semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner


def _run(mesh, seed=0):
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
        "--n_rollout_threads", "8", "--episode_length", "10",
        "--num_env_steps", "320", "--ppo_epoch", "2",
        "--hidden_size", "32", "--mesh_shape", str(mesh),
    ])
    runner = SharedRunner(cfg)
    ts, carry = runner.init(jax.random.PRNGKey(seed))
    ts, carry, m = runner._episode_fn(ts, carry, jax.random.PRNGKey(1))
    ts, carry, m = runner._episode_fn(ts, carry, jax.random.PRNGKey(2))
    return jax.device_get(ts.actor_params), jax.device_get(m)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_mesh_matches_single_device():
    p1, m1 = _run(1)
    p4, m4 = _run(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m1["value_loss"], m4["value_loss"],
                               rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_2d_mesh_tensor_parallel_matches_single_device():
    """(data=2, model=2) mesh — hidden dims sharded along 'model' —
    must match 1-device numerics: shardings change layout, not math."""
    p1, m1 = _run(1)
    p22, m22 = _run("2,2")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p22)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m1["value_loss"], m22["value_loss"],
                               rtol=2e-4, atol=1e-5)


def _run_separated(mesh, seed=0):
    from onpolicy_tpu.runner.separated_runner import SeparatedRunner
    cfg = config_from_args([
        "--algorithm_name", "happo", "--scenario_name", "simple_spread",
        "--n_rollout_threads", "8", "--episode_length", "10",
        "--num_env_steps", "320", "--ppo_epoch", "2",
        "--hidden_size", "32", "--share_policy", "false",
        "--mesh_shape", str(mesh),
    ])
    runner = SeparatedRunner(cfg)
    states, carry = runner.init(jax.random.PRNGKey(seed))
    states, carry, m = runner._episode_fn(states, carry,
                                          jax.random.PRNGKey(1),
                                          order=(1, 0, 2))
    return jax.device_get(states[0].actor_params), jax.device_get(m)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_separated_mesh_matches_single_device():
    """Separated/HAPPO path on a data-sharded mesh == 1-device."""
    p1, m1 = _run_separated(1)
    p4, m4 = _run_separated(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        m1["average_episode_rewards"], m4["average_episode_rewards"],
        rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_separated_2d_mesh_matches_single_device():
    """Separated/HAPPO path on a (data=2, model=2) tensor-sharded mesh
    == 1-device (round-1 advisor gap: only the data-parallel separated
    case was covered)."""
    p1, m1 = _run_separated(1)
    p22, m22 = _run_separated("2,2")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p22)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        m1["average_episode_rewards"], m22["average_episode_rewards"],
        rtol=2e-4, atol=1e-5)


def test_param_spec_rule():
    """Leaf rule: widest shardable dim goes to 'model', indivisible
    leaves replicate."""
    from jax.sharding import PartitionSpec as P
    from onpolicy_tpu.parallel.mesh import _param_spec
    z = jnp.zeros
    assert _param_spec(z((18, 32)), 2) == P(None, "model")      # column
    assert _param_spec(z((32, 1)), 2) == P("model", None)       # v head
    assert _param_spec(z((32,)), 2) == P("model")               # bias
    assert _param_spec(z((3, 5)), 2) == P()                     # indivisible
    assert _param_spec(z(()), 2) == P()                         # scalar


def test_episodes_per_call_equivalence():
    """Chained E=2 call == two single-episode calls (same keys)."""
    cfg_args = [
        "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
        "--n_rollout_threads", "4", "--episode_length", "10",
        "--num_env_steps", "160", "--ppo_epoch", "2", "--hidden_size", "32",
    ]
    r1 = SharedRunner(config_from_args(cfg_args))
    r2 = SharedRunner(config_from_args(cfg_args + ["--episodes_per_call",
                                                   "2"]))
    ts1, c1 = r1.init(jax.random.PRNGKey(0))
    ts2, c2 = r2.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 2)
    ts1, c1, _ = r1._episode_fn(ts1, c1, ks[0])
    ts1, c1, _ = r1._episode_fn(ts1, c1, ks[1])
    ts2, c2, _ = r2._multi_episode_fn(ts2, c2, key)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.actor_params),
                    jax.tree_util.tree_leaves(ts2.actor_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
