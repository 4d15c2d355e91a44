"""Kernel-level ablation of ONE Hanabi scan-of-rounds seat round
(round-4 VERDICT item 2: profile the env-step/staging kernel count
before spending the next lever).

Each component is measured as a jitted lax.scan of K iterations so the
axon-tunnel RTT amortizes away (single small dispatches measure the
tunnel, not the chip — docs/PROFILE_HANABI.md).  Components:

  engine2   2x vmapped je.step (raw transition, no observation)
  observe   1x fleet observe (encode + own-hand + legal + zero-gating)
  env2      2x pure_step (= 2x engine + 2x observe) as in a round
  actor2    2x actor forward at [N] (the two sequential seat calls)
  critic    1x deferred critic at [N*M]
  reset     masked_reset(all-false) + observe (round tail)
  round     full _device_round (ground truth, includes staging residual)

staging residual = round - env2 - actor2 - critic - reset_minus_observe.
Also prints top-level optimized-HLO instruction counts of the round
program (approximate kernel/thunk count on TPU).

Usage: python scripts/profile_hanabi_round.py [n_envs] [--bf16] [-K 100]
"""
from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.hanabi import jax_engine as je
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner


def sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    return float(jax.device_get(sum(jnp.sum(l.astype(jnp.float32))
                                    for l in leaves)))


def timed(label, fn, *args, reps=3, K=1):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts) / K
    print(f"{label:26s} {best * 1e3:9.3f} ms/iter  (scan K={K}; best of "
          f"{reps})", flush=True)
    return best


def hlo_instruction_counts(jitted, *args):
    txt = jitted.lower(*args).compile().as_text()
    # entry computation = the main() body of the optimized module
    counts: Counter = Counter()
    in_entry = False
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if s == "}":
                break
            if "=" in s and not s.startswith("//"):
                rhs = s.split("=", 1)[1].strip()
                # "f32[...]{...} opcode(...)" → opcode
                parts = rhs.split()
                if len(parts) >= 2:
                    op = parts[1].split("(")[0]
                    counts[op] += 1
    return counts


def main():
    args = list(sys.argv[1:])
    n_envs = int(args[0]) if args and args[0].isdigit() else 1000
    use_bf16 = "--bf16" in args
    K = int(args[args.index("-K") + 1]) if "-K" in args else 100
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Full",
        "--num_agents", "2", "--n_rollout_threads", str(n_envs),
        "--episode_length", "100",
        "--num_env_steps", str(n_envs * 100 * 1000),
        "--ppo_epoch", "15", "--num_mini_batch", "1", "--gain", "0.01",
        "--lr", "7e-4", "--critic_lr", "1e-3",
        "--hidden_size", "512", "--layer_N", "2",
        "--entropy_coef", "0.015",
        "--use_scan_rounds", "--use_jax_env",
    ] + (["--use_bf16"] if use_bf16 else []), env_name="Hanabi")
    runner = HanabiRunner(cfg)
    env = runner.envs
    game = env.game
    key = jax.random.PRNGKey(0)
    ts_state, carry, dbuf = runner.init_device(key)
    states = carry["env_states"]
    N, M = env.n_envs, env.num_agents
    acts = jnp.full((N,), -1, jnp.int32)

    print(f"Hanabi-Full N={n_envs} bf16={use_bf16} K={K}", flush=True)

    # --- engine-only transition, 2 seats per iter ---
    def engine2_scan(states):
        def body(s, _):
            s, r1 = jax.vmap(lambda g, a: je.step(game, g, a))(s, acts)
            s, r2 = jax.vmap(lambda g, a: je.step(game, g, a))(s, acts)
            return s, r1 + r2
        return jax.lax.scan(body, states, None, length=K)
    t_eng2 = timed("engine2 (2x je.step)", jax.jit(engine2_scan), states,
                   K=K)

    # --- observe only (carry obs sum so it isn't DCE'd) ---
    def observe_scan(states):
        def body(c, _):
            obs, share, avail, cur, done, scr = env.observe(states)
            return c + jnp.sum(obs) + jnp.sum(share) + jnp.sum(avail), None
        return jax.lax.scan(body, jnp.zeros(()), None, length=K)
    t_obs = timed("observe (1x)", jax.jit(observe_scan), states, K=K)

    # --- pure_step x2 per iter (engine + observe as the round does) ---
    def env2_scan(states):
        def body(s, _):
            tot = jnp.zeros(())
            for _ in range(2):
                s, obs, share, rew, done, avail, scr = env.pure_step(s, acts)
                tot = tot + jnp.sum(obs) + jnp.sum(share) + jnp.sum(avail) \
                    + jnp.sum(rew)
            return s, tot
        return jax.lax.scan(body, states, None, length=K)
    t_env2 = timed("env2 (2x pure_step)", jax.jit(env2_scan), states, K=K)

    # --- actor x2 per iter ---
    obs0 = jnp.asarray(carry["use_obs"])
    avail0 = jnp.ones((N, env.n_moves), jnp.float32)
    rnn0 = jnp.asarray(carry["rnn"][:, 0])
    m0 = jnp.ones((N, 1), jnp.float32)

    def actor2_scan(ts, key):
        def body(c, k):
            key, o = c
            k1, k2 = jax.random.split(k)
            a1, lp1, _ = runner._actor_step(ts, o, rnn0, m0, k1, avail0)
            a2, lp2, _ = runner._actor_step(ts, o, rnn0, m0, k2, avail0)
            # data-dep so the two calls serialize like the real round
            o = o + lp1 * 0.0 + lp2 * 0.0
            return (key, o), a1
        keys = jax.random.split(key, K)
        return jax.lax.scan(body, (key, obs0), keys)
    t_act2 = timed("actor2 (2x forward)", jax.jit(actor2_scan), ts_state,
                   key, K=K)

    # --- deferred critic, 1x [N*M] per iter ---
    share0 = jnp.asarray(carry["share_obs"]).reshape(N * M, -1)
    rnnc0 = jnp.asarray(carry["rnn_critic"]).reshape(
        N * M, *carry["rnn_critic"].shape[2:])
    mc0 = jnp.ones((N * M, 1), jnp.float32)

    def critic_scan(ts):
        def body(c, _):
            v, _ = runner._critic_batch(ts, share0 + c, rnnc0, mc0)
            return jnp.sum(v) * 0.0, None
        return jax.lax.scan(body, jnp.zeros(()), None, length=K)
    t_cri = timed("critic (1x [N*M])", jax.jit(critic_scan), ts_state, K=K)

    # --- masked reset (all-false) + observe: the round tail ---
    def reset_scan(states, key):
        mask = jnp.zeros((N,), bool)
        def body(c, k):
            s = env.masked_reset(states, mask, k)
            obs, share, avail, cur, done, scr = env.observe(s)
            return c + jnp.sum(obs), None
        keys = jax.random.split(key, K)
        return jax.lax.scan(body, jnp.zeros(()), keys)
    t_rst = timed("reset+observe (tail)", jax.jit(reset_scan), states, key,
                  K=K)

    # --- full round (ground truth) ---
    def round_scan(ts, carry, key):
        def body(c, k):
            carry, key = c
            carry, aux = runner._device_round(ts, carry, k)
            return (carry, aux["key"]), aux["score_sum"]
        keys = jax.random.split(key, K)
        return jax.lax.scan(body, (carry, key), keys)
    round_jit = jax.jit(round_scan)
    t_round = timed("FULL round", round_jit, ts_state, carry, key, K=K)

    resid = t_round - t_env2 - t_act2 - t_cri - (t_rst - t_obs)
    print(f"\nper-round attribution (ms): env2={t_env2*1e3:.3f} "
          f"[engine2={t_eng2*1e3:.3f} observe2~={2*t_obs*1e3:.3f}] "
          f"actor2={t_act2*1e3:.3f} critic={t_cri*1e3:.3f} "
          f"reset_tail={(t_rst)*1e3:.3f} "
          f"staging_residual={resid*1e3:.3f} of round={t_round*1e3:.3f}")

    print("\noptimized-HLO top-level instruction counts (round program):")
    counts = hlo_instruction_counts(round_jit, ts_state, carry, key)
    total = sum(counts.values())
    for op, n in counts.most_common(15):
        print(f"  {op:24s} {n}")
    print(f"  TOTAL top-level instrs   {total}")


if __name__ == "__main__":
    main()
