"""Honest phase-level timing of the shared-runner episode on the real chip.

`jax.block_until_ready` does NOT synchronize through the axon tunnel
(round-1 verdict: it returned in ms while 190s of work was still queued),
so every timing here forces a device->host transfer of a scalar derived
from the phase output (`jax.device_get`), which cannot complete before
the work does.

Usage: python scripts/profile_episode.py [n_envs] [episodes]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner


def sync(tree):
    """Force completion: pull one scalar element from every leaf."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jax.device_get([jnp.sum(l) for l in leaves if hasattr(l, "shape")])


def timed(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    sync(out)  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:28s} {best*1e3:10.1f} ms   (reps: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")")
    return out, best


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    T = 25
    cfg = config_from_args([
        "--algorithm_name", "mappo",
        "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs),
        "--episode_length", str(T),
        "--num_env_steps", str(n_envs * T * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--lr", "7e-4", "--critic_lr", "7e-4",
        "--hidden_size", "64",
    ])
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)

    # --- full episode -------------------------------------------------
    def full(ts, c, k):
        return runner._episode_fn(ts, c, k)

    key, k = jax.random.split(key)
    (_, _, m), t_full = timed("full episode", full, train_state, carry, k)
    sps = n_envs * T / t_full
    print(f"{'  -> env-steps/s':28s} {sps:12,.0f}")

    # --- phases, compiled separately -----------------------------------
    algo = runner.algo

    @jax.jit
    def rollout_only(ts, c, k):
        cfg_ = runner.cfg
        N, M = runner.N, runner.num_agents
        BA = N * M
        flat = lambda x: x.reshape(BA, *x.shape[2:])
        unflat = lambda x: x.reshape(N, M, *x.shape[1:])

        def step_fn(cc, step_key):
            k_act, k_env = jax.random.split(step_key)
            obs = cc["obs"]
            share_obs = runner._share_obs(obs)
            values, actions, logp, rnn_a, rnn_c = algo.get_actions(
                ts, flat(share_obs), flat(obs), flat(cc["rnn_actor"]),
                flat(cc["rnn_critic"]), flat(cc["masks"]), k_act)
            env_states, obs2, rewards, dones = runner.envs.step(
                cc["env_states"], unflat(actions), k_env)
            c2 = {"env_states": env_states, "obs": runner._stack_obs(obs2),
                  "rnn_actor": unflat(rnn_a), "rnn_critic": unflat(rnn_c),
                  "masks": 1.0 - dones[..., None].astype(jnp.float32)}
            staged = {"share_obs": share_obs, "obs": obs,
                      "rnn_states": cc["rnn_actor"],
                      "rnn_states_critic": cc["rnn_critic"],
                      "actions": unflat(actions),
                      "action_log_probs": unflat(logp),
                      "value_preds": unflat(values),
                      "rewards": rewards, "masks": cc["masks"],
                      "active_masks": jnp.ones_like(cc["masks"])}
            return c2, staged

        keys = jax.random.split(k, cfg_.episode_length)
        c2, traj = jax.lax.scan(step_fn, c, keys)
        return c2, traj

    key, k = jax.random.split(key)
    (carry2, traj), t_roll = timed("rollout scan", rollout_only,
                                   train_state, carry, k)

    from onpolicy_tpu import buffer as buf_lib

    @jax.jit
    def gae_only(ts, c2, traj):
        N, M = runner.N, runner.num_agents
        BA = N * M
        flat = lambda x: x.reshape(BA, *x.shape[2:])
        unflat = lambda x: x.reshape(N, M, *x.shape[1:])
        last = {"share_obs": runner._share_obs(c2["obs"]), "obs": c2["obs"],
                "rnn_states": c2["rnn_actor"],
                "rnn_states_critic": c2["rnn_critic"],
                "masks": c2["masks"],
                "active_masks": jnp.ones_like(c2["masks"])}
        buf = buf_lib.from_rollout(traj, last)
        nv = unflat(algo.get_values(ts, flat(last["share_obs"]),
                                    flat(c2["rnn_critic"]), flat(c2["masks"])))
        return buf.compute_returns(nv, ts.vnorm, gamma=cfg.gamma,
                                   gae_lambda=cfg.gae_lambda,
                                   use_gae=cfg.use_gae,
                                   use_proper_time_limits=cfg.use_proper_time_limits)

    buf, t_gae = timed("buffer + GAE", gae_only, train_state, carry2, traj)

    @jax.jit
    def train_only(ts, b, k):
        return algo.train(ts, b, k)

    key, k = jax.random.split(key)
    _, t_train = timed("train (10 epochs)", train_only, train_state, buf, k)

    print(f"\nsum of phases: {(t_roll+t_gae+t_train)*1e3:.1f} ms "
          f"(full: {t_full*1e3:.1f} ms)")

    # FLOPs from cost analysis
    try:
        comp = jax.jit(full).lower(train_state, carry, k).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops")
        if fl:
            print(f"episode flops: {fl/1e9:.1f} GFLOP -> "
                  f"{fl/t_full/1e12:.3f} TFLOP/s achieved")
    except Exception as e:
        print("cost analysis unavailable:", e)


if __name__ == "__main__":
    main()
