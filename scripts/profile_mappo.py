"""Phase + kernel profile of the MPE feed-forward HEADLINE program
(round-4 VERDICT item 6: the vs_baseline number — 2.32M steps/s, flat
for three rounds — had no committed profile).

Phases (each separately jitted, forced-transfer sync):
  full episode | rollout scan | GAE | train (10 epochs) |
  policy-only scan | env-step-only scan | episodes_per_call chaining

Then a real jax.profiler device trace of the episode program is
captured and the top ops aggregated + attributed to source lines (the
method that found the Hanabi engine's tiny-axis gathers, round 5).

Usage: python scripts/profile_mappo.py [n_envs] [--trace]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner


def sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    return float(jax.device_get(
        sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)))


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
    print(f"{label:34s} {best*1e3:9.1f} ms   (reps: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)
    return out, best


def main():
    args = list(sys.argv[1:])
    n_envs = int(args[0]) if args and args[0].isdigit() else 16384
    do_trace = "--trace" in args
    T = 25
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs), "--episode_length", str(T),
        "--num_env_steps", str(n_envs * T * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--lr", "7e-4", "--critic_lr", "7e-4", "--hidden_size", "64",
        "--use_bf16",
    ])
    runner = SharedRunner(cfg)
    algo = runner.algo
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    ts_state, carry = runner.init(k0)
    N, M = runner.N, runner.num_agents
    BA = N * M
    flat = lambda x: x.reshape(BA, *x.shape[2:])
    unflat = lambda x: x.reshape(N, M, *x.shape[1:])
    print(f"MPE spread mappo N={n_envs} T={T} bf16", flush=True)

    _, t_ep = timed("full episode", runner._episode_fn, ts_state, carry,
                    key)
    print(f"  => {T * n_envs / t_ep / 1e6:.2f}M steps/s", flush=True)

    # ---- rollout scan only (policy + env + staging, no train) ----
    from onpolicy_tpu import buffer as buf_lib

    def rollout_only(ts, c, k):
        def step_fn(cc, step_key):
            k_act, k_env = jax.random.split(step_key)
            obs = cc["obs"]
            share_obs = runner._share_obs(obs)
            values, actions, logp, rnn_a, rnn_c = algo.get_actions(
                ts, flat(share_obs), flat(obs), flat(cc["rnn_actor"]),
                flat(cc["rnn_critic"]), flat(cc["masks"]), k_act)
            env_states, obs2, rewards, dones = runner.envs.step(
                cc["env_states"], unflat(actions), k_env)
            cc = {"env_states": env_states,
                  "obs": runner._stack_obs(obs2),
                  "rnn_actor": unflat(rnn_a), "rnn_critic": unflat(rnn_c),
                  "masks": 1.0 - dones[..., None].astype(jnp.float32)}
            return cc, (rewards, values)
        c2, (rew, vals) = jax.lax.scan(step_fn, c,
                                       jax.random.split(k, T))
        return c2, jnp.sum(rew) + jnp.sum(vals)
    _, t_roll = timed("rollout scan (T=25)", jax.jit(rollout_only),
                      ts_state, carry, key)

    # ---- policy-only scan ----
    def policy_only(ts, c, k):
        obs = c["obs"]
        share_obs = runner._share_obs(obs)
        def body(acc, step_key):
            values, actions, logp, rnn_a, rnn_c = algo.get_actions(
                ts, flat(share_obs), flat(obs) + acc * 0.0,
                flat(c["rnn_actor"]), flat(c["rnn_critic"]),
                flat(c["masks"]), step_key)
            return jnp.sum(values) * 0.0, jnp.sum(logp)
        return jax.lax.scan(body, jnp.zeros(()), jax.random.split(k, T))
    _, t_pol = timed("policy-only scan (T=25)", jax.jit(policy_only),
                     ts_state, carry, key)

    # ---- env-step-only scan ----
    def env_only(c, k):
        def body(cc, step_key):
            acts = jnp.zeros((N, M, 1), jnp.int32)
            env_states, obs2, rewards, dones = runner.envs.step(
                cc, acts, step_key)
            return env_states, jnp.sum(rewards)
        return jax.lax.scan(body, c["env_states"],
                            jax.random.split(k, T))
    _, t_env = timed("env-step-only scan (T=25)", jax.jit(env_only),
                     carry, key)

    # ---- GAE + train on a fixed buffer ----
    def collect_buf(ts, c, k):
        def step_fn(cc, step_key):
            k_act, k_env = jax.random.split(step_key)
            obs = cc["obs"]
            share_obs = runner._share_obs(obs)
            values, actions, logp, rnn_a, rnn_c = algo.get_actions(
                ts, flat(share_obs), flat(obs), flat(cc["rnn_actor"]),
                flat(cc["rnn_critic"]), flat(cc["masks"]), k_act)
            env_states, obs2, rewards, dones = runner.envs.step(
                cc["env_states"], unflat(actions), k_env)
            staged = {
                "share_obs": share_obs, "obs": obs,
                "rnn_states": cc["rnn_actor"],
                "rnn_states_critic": cc["rnn_critic"],
                "actions": unflat(actions),
                "action_log_probs": unflat(logp),
                "value_preds": unflat(values),
                "rewards": rewards, "masks": cc["masks"],
                "active_masks": jnp.ones_like(cc["masks"]),
            }
            cc = {"env_states": env_states, "obs": runner._stack_obs(obs2),
                  "rnn_actor": unflat(rnn_a), "rnn_critic": unflat(rnn_c),
                  "masks": 1.0 - dones[..., None].astype(jnp.float32)}
            return cc, staged
        c2, traj = jax.lax.scan(step_fn, c, jax.random.split(k, T))
        last = {
            "share_obs": runner._share_obs(c2["obs"]), "obs": c2["obs"],
            "rnn_states": c2["rnn_actor"],
            "rnn_states_critic": c2["rnn_critic"], "masks": c2["masks"],
            "active_masks": jnp.ones_like(c2["masks"]),
        }
        return buf_lib.from_rollout(traj, last), c2

    buf, c2 = jax.jit(collect_buf)(ts_state, carry, key)

    def gae_only(ts, b, c2k):
        c2 = c2k
        critic_in = (runner._share_obs(c2["obs"])
                     if algo.critic_reads == "share_obs" else c2["obs"])
        nv = unflat(algo.get_values(ts, flat(critic_in),
                                    flat(c2["rnn_critic"]),
                                    flat(c2["masks"])))
        return b.compute_returns(nv, ts.vnorm, gamma=cfg.gamma,
                                 gae_lambda=cfg.gae_lambda,
                                 use_gae=cfg.use_gae,
                                 use_proper_time_limits=False)
    buf2, t_gae = timed("GAE + bootstrap", jax.jit(gae_only), ts_state,
                        buf, c2)

    def train_only(ts, b, k):
        return algo.train(ts, b, k)
    _, t_train = timed("train (10 epochs)", jax.jit(train_only),
                       ts_state, buf2, key)

    # ---- episodes_per_call chaining lever ----
    for E in (4,):
        def multi(ts, c, k):
            def body(sc, kk):
                ts2, cc = sc
                ts2, cc, m = runner._episode(ts2, cc, kk)
                return (ts2, cc), m["value_loss"]
            (ts2, cc), vl = jax.lax.scan(body, (ts, c),
                                         jax.random.split(k, E))
            return ts2, cc, vl
        _, t_multi = timed(f"chained x{E} episodes", jax.jit(multi),
                           ts_state, carry, key)
        print(f"  => chained rate {E * T * n_envs / t_multi / 1e6:.2f}M "
              f"steps/s (vs {T * n_envs / t_ep / 1e6:.2f}M)", flush=True)

    print(f"\nphase sum: rollout {t_roll*1e3:.0f} + gae {t_gae*1e3:.0f} "
          f"+ train {t_train*1e3:.0f} = "
          f"{(t_roll + t_gae + t_train)*1e3:.0f} vs episode "
          f"{t_ep*1e3:.0f} ms")
    print(f"rollout split: policy {t_pol*1e3:.0f} env {t_env*1e3:.0f} "
          f"staging-residual {(t_roll - t_pol - t_env)*1e3:.0f} ms")

    if do_trace:
        import trace_tools
        path = trace_tools.capture(
            lambda: runner._episode_fn(ts_state, carry, key), sync=sync)
        agg, cnt, tot = trace_tools.aggregate(path)
        print(f"\ndevice trace: {tot/1e3:.1f} ms over "
              f"{sum(cnt.values())} events, {len(agg)} distinct ops")
        top = [n for n, _ in agg.most_common(20)]
        srcs = trace_tools.attribute_sources(
            runner._episode_fn, (ts_state, carry, key), top)
        for n, d in agg.most_common(20):
            src, shape = srcs.get(n, ("?", "?"))
            print(f"  {d/1e3:8.2f} ms x{cnt[n]:5d}  {n[:40]:40s} "
                  f"{src} {shape}")


if __name__ == "__main__":
    main()
