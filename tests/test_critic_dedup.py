"""use_critic_dedup: the shared-MPE critic dedup must be mathematically
EXACT — same training trajectory as the plain path (the dedup only
removes agent-duplicated rows whose share_obs is broadcast-identical;
autodiff sums the per-agent cotangents through the broadcast)."""
from __future__ import annotations

import jax
import numpy as np
import pytest

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner

ARGS = [
    "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
    "--num_agents", "3", "--num_landmarks", "3",
    "--n_rollout_threads", "8", "--episode_length", "10",
    "--num_env_steps", "8000", "--ppo_epoch", "3", "--num_mini_batch", "1",
    "--hidden_size", "32", "--seed", "3",
]


def _run(extra):
    cfg = config_from_args(ARGS + extra)
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    ts, carry = runner.init(k0)
    rows = []
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, carry, m = runner._episode_fn(ts, carry, k)
        rows.append({k2: float(v) for k2, v in jax.device_get(m).items()})
    leaf = float(jax.device_get(
        sum(np.float64(np.sum(np.asarray(x, np.float64)))
            for x in jax.tree_util.tree_leaves(ts.critic_params))))
    return rows, leaf


def test_dedup_matches_plain_path():
    rows_a, leaf_a = _run([])
    rows_b, leaf_b = _run(["--use_critic_dedup"])
    for ra, rb in zip(rows_a, rows_b):
        assert set(ra) == set(rb)
        for k in ra:
            np.testing.assert_allclose(rb[k], ra[k], rtol=2e-4, atol=2e-5,
                                       err_msg=k)
    np.testing.assert_allclose(leaf_b, leaf_a, rtol=1e-4)


def test_dedup_guards():
    with pytest.raises(ValueError, match="use_centralized_V"):
        config_from_args(ARGS + ["--use_critic_dedup",
                                 "--use_centralized_V", "false"])
    with pytest.raises(ValueError, match="feed-forward"):
        config_from_args([a if a != "mappo" else "rmappo" for a in ARGS]
                         + ["--use_critic_dedup"])
    with pytest.raises(ValueError, match="num_mini_batch"):
        config_from_args(ARGS[:-1] + ["5", "--use_critic_dedup",
                                      "--num_mini_batch", "2"])
    with pytest.raises(ValueError, match="invalid for Hanabi"):
        config_from_args(ARGS + ["--use_critic_dedup"],
                         env_name="Hanabi")
