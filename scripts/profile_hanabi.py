"""Phase-level timing of the device-resident Hanabi-Full episode program
(round-2 VERDICT weak 6 / item 8: record the profile that justifies the
perf narrative).

The scan-of-rounds episode fuses rollout + GAE + PPO into ONE program,
so phases are split by timing separately-jitted sub-programs on the real
chip (transfer-forced sync — block_until_ready is a no-op through the
axon tunnel):

  * env_step      — one fleet pure_step (vmapped engine + encoders)
  * policy_round  — one full seat round (_device_round: M policy calls,
                    staging math, env steps, masked reset)
  * episode_nt    — whole episode WITHOUT the train phase (ep_first)
  * episode_tr    — whole episode WITH the deferred train (ep_train)
  * train phase   ≈ episode_tr − episode_nt

Also dumps a jax.profiler trace (utils/profiling.py) for the trained
episode when --trace is passed.

Usage: python scripts/profile_hanabi.py [n_envs] [--bf16] [--trace DIR]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner


def sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    return float(jax.device_get(sum(jnp.sum(l.astype(jnp.float32))
                                    for l in leaves)))


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:24s} {best * 1e3:10.1f} ms   (reps: "
          + ", ".join(f"{t * 1e3:.1f}" for t in ts) + ")")
    return out, best


def main():
    args = [a for a in sys.argv[1:]]
    n_envs = int(args[0]) if args and args[0].isdigit() else 1000
    use_bf16 = "--bf16" in args
    trace_dir = None
    if "--trace" in args:
        trace_dir = args[args.index("--trace") + 1]
    T = 100
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Full",
        "--num_agents", "2", "--n_rollout_threads", str(n_envs),
        "--episode_length", str(T),
        "--num_env_steps", str(n_envs * T * 1000),
        "--ppo_epoch", "15", "--num_mini_batch", "1", "--gain", "0.01",
        "--lr", "7e-4", "--critic_lr", "1e-3",
        "--hidden_size", "512", "--layer_N", "2",
        "--entropy_coef", "0.015",
        "--use_scan_rounds", "--use_jax_env",
    ] + (["--use_bf16"] if use_bf16 else []), env_name="Hanabi")
    runner = HanabiRunner(cfg)
    key = jax.random.PRNGKey(0)
    ts_state, carry, dbuf = runner.init_device(key)

    env = runner.envs
    acts = jnp.full((n_envs,), -1, jnp.int32)
    step_jit = jax.jit(env.pure_step)
    _, t_env = timed("env pure_step (fleet)", step_jit,
                     carry["env_states"], acts)

    round_jit = jax.jit(runner._device_round)
    _, t_round = timed("seat round (policy+env)", round_jit,
                       ts_state, carry, key)

    ep_nt = jax.jit(lambda t, c, b, k: runner._device_episode(
        t, c, b, k, False))
    ep_tr = jax.jit(lambda t, c, b, k: runner._device_episode(
        t, c, b, k, True))
    _, t_nt = timed("episode (no train)", ep_nt, ts_state, carry, dbuf, key)
    out_tr, t_tr = timed("episode (with train)", ep_tr, ts_state, carry,
                         dbuf, key)
    print(f"{'train phase (delta)':24s} {(t_tr - t_nt) * 1e3:10.1f} ms")
    print(f"{'rollout share':24s} {t_nt / t_tr * 100:9.1f} %")
    print(f"{'env share of round':24s} "
          f"{2 * t_env / t_round * 100:9.1f} %   (2 seats)")
    print(f"buffer-steps/s: {T * n_envs / t_tr:,.0f}   "
          f"precision: {'bf16' if use_bf16 else 'fp32'}")

    if trace_dir:
        from onpolicy_tpu.utils import profiling
        with profiling.trace(trace_dir):
            out = ep_tr(ts_state, carry, dbuf, key)
            sync(out)
        print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
