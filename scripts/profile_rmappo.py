"""Phase-level timing of the RECURRENT flagship (rmappo paper-spread at
bench scale) on the real chip — attributes the gap vs the feed-forward
headline (round-3 VERDICT weak #3: 746k vs 2.33M steps/s).

Phases, each compiled separately and synced with a forced device->host
transfer (block_until_ready does not synchronize through the tunnel):
  full episode | rollout scan | GAE | train (10 epochs) |
  minibatch layout (recurrent_minibatches) | one _update (fwd+bwd) |
  actor evaluate_seq fwd | critic forward_seq fwd

Usage: python scripts/profile_rmappo.py [n_envs] [use_bf16]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner


def sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    return float(jax.device_get(
        sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)))


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
    print(f"{label:32s} {best*1e3:10.1f} ms   (reps: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")")
    return out, best


def fused_variant(n_envs=16384, bf16=True):
    """Round-4 VERDICT item 7: measure the ONE asserted-not-measured
    line of docs/PROFILE_RMAPPO.md — a single scan carrying BOTH the
    actor and critic hidden states over the same [L, B] sequence vs the
    shipped two-scan path, at the rmappo minibatch GRU shape
    ([L=10, B=T·N·M/L, H=64]). Grad-step time of sum-of-outputs loss."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.models import common as cm
    from onpolicy_tpu.models import gru

    T, L, M = 25, 10, 3
    B = T * n_envs * M // L
    H = 64
    cfg = config_from_args([
        "--algorithm_name", "rmappo", "--hidden_size", str(H),
        "--recurrent_N", "1", "--data_chunk_length", str(L),
    ] + (["--use_bf16"] if bf16 else []))
    key = jax.random.PRNGKey(0)
    ka, kc, kx = jax.random.split(key, 3)
    pa = gru.init(ka, cfg, H)
    pc = gru.init(kc, cfg, H)
    xa = jax.random.normal(kx, (L, B, H), jnp.float32)
    xc = xa * 0.5 + 1.0
    h0 = jnp.zeros((B, cfg.recurrent_N, H), jnp.float32)
    masks = jnp.ones((L, B, 1), jnp.float32)
    print(f"fused-variant shapes: [L={L}, B={B}, H={H}] bf16={bf16}")

    def two_scan_loss(params, xa, xc):
        pa_, pc_ = params
        oa, _ = gru.sequence(cfg, pa_, xa, h0, masks)
        oc, _ = gru.sequence(cfg, pc_, xc, h0, masks)
        return jnp.sum(oa.astype(jnp.float32)) \
            + jnp.sum(oc.astype(jnp.float32))

    def fused_loss(params, xa, xc):
        pa_, pc_ = params
        dt = cm.compute_dtype(cfg)
        pa_ = cm.cast_floats(pa_, dt)
        pc_ = cm.cast_floats(pc_, dt)

        def body(carry, xm):
            ha, hc = carry
            xa_t, xc_t, m = xm
            g = m[..., None].astype(dt)
            ha = ha * g
            hc = hc * g
            na, nc = [], []
            ia, ic = xa_t.astype(dt), xc_t.astype(dt)
            for i in range(cfg.recurrent_N):
                hia = gru._cell(pa_["layers"][i], ia, ha[:, i])
                hic = gru._cell(pc_["layers"][i], ic, hc[:, i])
                na.append(hia)
                nc.append(hic)
                ia, ic = hia, hic
            return (jnp.stack(na, 1), jnp.stack(nc, 1)), (ia, ic)

        (_, _), (oa, oc) = jax.lax.scan(
            body, (h0.astype(dt), h0.astype(dt)), (xa, xc, masks))
        oa = cm.layer_norm_apply(pa_["norm"], oa)
        oc = cm.layer_norm_apply(pc_["norm"], oc)
        return jnp.sum(oa.astype(jnp.float32)) \
            + jnp.sum(oc.astype(jnp.float32))

    g2 = jax.jit(jax.grad(two_scan_loss))
    gf = jax.jit(jax.grad(fused_loss))
    _, t2 = timed("two-scan grad (shipped)", g2, (pa, pc), xa, xc)
    _, tf = timed("fused-scan grad", gf, (pa, pc), xa, xc)
    print(f"fused/two-scan ratio: {tf / t2:.3f} "
          f"({'WIN' if tf < t2 else 'LOSS'} for fusion)")


def main():
    if "--fused" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--fused"]
        n_envs = int(args[0]) if args and args[0].isdigit() else 16384
        fused_variant(n_envs)
        return
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    bf16 = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    T, L = 25, 10
    cfg = config_from_args([
        "--algorithm_name", "rmappo", "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs),
        "--episode_length", str(T),
        "--num_env_steps", str(n_envs * T * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--data_chunk_length", str(L),
        "--lr", "7e-4", "--critic_lr", "7e-4", "--hidden_size", "64",
    ] + (["--use_bf16"] if bf16 else []))
    print(f"n_envs={n_envs} T={T} L={L} bf16={bf16} "
          f"backend={jax.default_backend()}")
    runner = SharedRunner(cfg)
    algo = runner.algo
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)

    key, k = jax.random.split(key)
    (_, _, m), t_full = timed("full episode", runner._episode_fn,
                              train_state, carry, k)
    print(f"{'  -> env-steps/s':32s} {n_envs * T / t_full:12,.0f}")

    # --- rollout (same structure as _episode_fn's scan) ---------------
    N, M = runner.N, runner.num_agents
    BA = N * M
    flat = lambda x: x.reshape(BA, *x.shape[2:])
    unflat = lambda x: x.reshape(N, M, *x.shape[1:])

    @jax.jit
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

        keys = jax.random.split(k, cfg.episode_length)
        return jax.lax.scan(step_fn, c, keys)

    key, k = jax.random.split(key)
    (carry2, traj), t_roll = timed("rollout scan", rollout_only,
                                   train_state, carry, k)

    from onpolicy_tpu import buffer as buf_lib

    @jax.jit
    def gae_only(ts, c2, traj):
        last = {"share_obs": runner._share_obs(c2["obs"]), "obs": c2["obs"],
                "rnn_states": c2["rnn_actor"],
                "rnn_states_critic": c2["rnn_critic"],
                "masks": c2["masks"],
                "active_masks": jnp.ones_like(c2["masks"])}
        buf = buf_lib.from_rollout(traj, last)
        nv = unflat(algo.get_values(ts, flat(last["share_obs"]),
                                    flat(c2["rnn_critic"]),
                                    flat(c2["masks"])))
        return buf.compute_returns(nv, ts.vnorm, gamma=cfg.gamma,
                                   gae_lambda=cfg.gae_lambda,
                                   use_gae=cfg.use_gae,
                                   use_proper_time_limits=False)

    buf, t_gae = timed("GAE + bootstrap", gae_only, train_state, carry2,
                       traj)

    @jax.jit
    def train_only(ts, buf, k):
        return algo.train(ts, buf, k)

    key, k = jax.random.split(key)
    _, t_train = timed("train (10 epochs)", train_only, train_state, buf, k)

    # --- inside the update --------------------------------------------
    from onpolicy_tpu.ops import losses

    @jax.jit
    def layout_only(buf, k):
        adv = losses.normalize_advantages(buf.advantages, None)
        return buf_lib.recurrent_minibatches(buf, adv, k, 1, L)

    key, k = jax.random.split(key)
    mbs, t_layout = timed("recurrent_minibatches layout", layout_only,
                          buf, k)
    mb = jax.tree_util.tree_map(lambda x: x[0], mbs)

    @jax.jit
    def update_only(ts, mb):
        return algo._update(ts, mb)

    _, t_upd = timed("one _update (fwd+bwd+adam)", update_only,
                     train_state, mb)

    @jax.jit
    def actor_seq(params, mb):
        return algo.actor.evaluate_seq(
            params, mb["obs"], mb["rnn_states"], mb["actions"],
            mb["masks"], None, None)

    _, t_aseq = timed("actor evaluate_seq fwd", actor_seq,
                      train_state.actor_params, mb)

    @jax.jit
    def critic_seq(params, mb):
        return algo.critic.forward_seq(
            params, mb["share_obs"], mb["rnn_states_critic"], mb["masks"])

    _, t_cseq = timed("critic forward_seq fwd", critic_seq,
                      train_state.critic_params, mb)

    print("\nattribution:")
    print(f"  rollout {t_roll*1e3:8.1f} ms | gae {t_gae*1e3:6.1f} ms | "
          f"train {t_train*1e3:8.1f} ms | layout(once) {t_layout*1e3:6.1f}")
    print(f"  per-epoch update {t_upd*1e3:8.1f} ms "
          f"(actor seq fwd {t_aseq*1e3:6.1f}, critic seq fwd "
          f"{t_cseq*1e3:6.1f})")


if __name__ == "__main__":
    main()
