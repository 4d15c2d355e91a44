"""Mixed-precision (use_bf16) compute-path tests.

The bf16 mode runs base/GRU matmuls + LayerNorms in bfloat16 while
params, heads, distributions and losses stay fp32 (models/common.py
compute_dtype). These tests pin: outputs stay fp32 and close to the
fp32 path, and end-to-end training still learns.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.models.actor_critic import Actor, Critic
from onpolicy_tpu.utils import spaces as sp


def _cfg(**over):
    return config_from_args([], env_name="MPE", scenario_name="simple_spread",
                            num_agents=3, **over)


def test_bf16_outputs_match_fp32_loosely():
    cfg32 = _cfg(use_recurrent_policy=True)
    cfg16 = cfg32.replace(use_bf16=True)
    space = sp.Discrete(5)
    actor = Actor(cfg32, sp.Box((18,)), space)
    params = actor.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B = 128
    obs = jnp.asarray(rng.standard_normal((B, 18)), jnp.float32)
    hxs = jnp.asarray(rng.standard_normal((B, 1, cfg32.hidden_size)) * 0.3,
                      jnp.float32)
    masks = jnp.ones((B, 1))
    action = jnp.asarray(rng.integers(0, 5, (B, 1)), jnp.float32)

    a16 = Actor(cfg16, sp.Box((18,)), space)
    lp32, ent32 = actor.evaluate(params, obs, hxs, action, masks)
    lp16, ent16 = a16.evaluate(params, obs, hxs, action, masks)
    assert lp16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lp16), np.asarray(lp32),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(float(ent16), float(ent32), atol=0.02)

    critic32 = Critic(cfg32, sp.Box((54,)))
    cparams = critic32.init(jax.random.PRNGKey(1))
    cobs = jnp.asarray(rng.standard_normal((B, 54)), jnp.float32)
    v32, _ = critic32.forward(cparams, cobs, hxs, masks)
    v16, h16 = Critic(cfg16, sp.Box((54,))).forward(cparams, cobs, hxs, masks)
    assert v16.dtype == jnp.float32 and h16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               atol=0.05, rtol=0.05)


def test_bf16_training_learns():
    """End-to-end bf16 MAPPO on simple_spread: finite metrics, reward
    improves over the run (same harness as the fp32 end-to-end test)."""
    from onpolicy_tpu.runner.shared_runner import SharedRunner
    cfg = _cfg(algorithm_name="rmappo", n_rollout_threads=32,
               episode_length=25, num_env_steps=24000, ppo_epoch=5,
               num_mini_batch=1, hidden_size=64, lr=7e-4, critic_lr=7e-4,
               use_bf16=True, seed=3)
    runner = SharedRunner(cfg)
    _, history = runner.run(log_fn=None)
    rows = [h for h in history if "average_episode_rewards" in h]
    assert all(np.isfinite(r["average_episode_rewards"]) for r in rows)
    first = np.mean([r["average_episode_rewards"] for r in rows[:3]])
    last = np.mean([r["average_episode_rewards"] for r in rows[-3:]])
    assert last > first + 5.0, (first, last)
