"""Shared-policy runner for on-device vectorized envs (MPE family).

The reference's episode loop (`/root/reference/onpolicy/runner/shared/
mpe_runner.py:16-79`) interleaves per-step GPU inference, subprocess env
stepping, and host buffer copies. Here one `episode()` call is a single
jit-compiled XLA program:

    rollout = lax.scan(policy-act → env-step → stage, length=T)
    buffer  = assemble [T+1] slots from the scan
    returns = reverse-scan GAE
    update  = ppo_epoch × num_mini_batch nested scans

The host only sees one device round-trip per episode (metrics fetch).
Collection carries (env state, obs, rnn states, masks) straight into the
next episode — the reference's `after_update` slot-T→0 copy is implicit.

Sharding: with a multi-device mesh the env/batch axis (N) is sharded
along 'data'; params are replicated. Under jit-with-shardings XLA
inserts the gradient/normalizer psums automatically.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.mappo import MAPPO
from onpolicy_tpu.algorithms.mat import MAT
from onpolicy_tpu.envs.mpe import make_vec_env
from onpolicy_tpu.parallel import mesh as mesh_lib
from onpolicy_tpu.utils import checkpoint as ckpt_lib
from onpolicy_tpu.utils import profiling
from onpolicy_tpu.utils import spaces as sp


class SharedRunner:
    def __init__(self, cfg, vec_env=None, eval_env=None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.envs = vec_env if vec_env is not None else make_vec_env(cfg)
        self.eval_envs = eval_env
        self.num_agents = M = self.envs.num_agents
        self.N = self.envs.n_envs

        obs_dims = {sp.obs_shape(s) for s in self.envs.observation_space}
        if len(obs_dims) != 1:
            raise ValueError(
                "shared policy requires homogeneous obs spaces; "
                "use the separated runner (share_policy=False)")
        act_set = set(self.envs.action_space)
        if len(act_set) != 1:
            raise ValueError("shared policy requires homogeneous action "
                             "spaces; use the separated runner")
        obs_space = self.envs.observation_space[0]
        share_obs_space = (self.envs.share_observation_space[0]
                           if cfg.use_centralized_V else obs_space)
        self.act_space = self.envs.action_space[0]

        self.episodes = int(cfg.num_env_steps) // cfg.episode_length // self.N
        if cfg.algorithm_name in ("mat", "mat_dec"):
            self.algo = MAT(cfg, obs_space, share_obs_space, self.act_space,
                            total_updates=self.episodes, num_agents=M)
        else:
            self.algo = MAPPO(cfg, obs_space, share_obs_space, self.act_space,
                              total_updates=self.episodes)

        self.mesh = mesh_lib.make_mesh(cfg.mesh_shape)
        self._episode_fn = jax.jit(self._episode)
        # chained variant: scan E episodes inside ONE device call,
        # amortizing per-dispatch latency (significant through remote
        # tunnels); metrics are averaged over the chain.
        E = max(cfg.episodes_per_call, 1)
        if E > 1:
            def multi(train_state, carry, key):
                def body(c, k):
                    ts, cr = c
                    ts, cr, m = self._episode(ts, cr, k)
                    return (ts, cr), m
                (ts, cr), ms = jax.lax.scan(
                    body, (train_state, carry), jax.random.split(key, E))
                return ts, cr, jax.tree_util.tree_map(
                    lambda x: jnp.mean(x, axis=0), ms)
            self._multi_episode_fn = jax.jit(multi)
        else:
            self._multi_episode_fn = self._episode_fn
        self._eval_fn = jax.jit(self._eval_episode) if eval_env else None

    # ------------------------------------------------------------------
    def init(self, key: jax.Array):
        """→ (train_state, carry) — carry is the rollout collection state."""
        k_model, k_env = jax.random.split(key)
        train_state = self.algo.init_state(k_model)
        self._restore_meta = None          # (step, key) when resuming
        if self.cfg.model_dir:
            restored, step, rkey = ckpt_lib.restore(self.cfg.model_dir,
                                                    train_state)
            train_state = jax.tree_util.tree_map(jnp.asarray, restored)
            self._restore_meta = (step, rkey)
        env_states, obs = self.envs.reset(k_env)
        carry = self._fresh_carry(env_states, obs)
        if jax.process_count() > 1:
            # multi-host: every process computed the same full-batch
            # reset from the shared key; each contributes its local rows
            from onpolicy_tpu.parallel import distributed
            train_state, carry = distributed.shard_train_inputs_multihost(
                self.mesh, train_state, carry, self.N)
        elif len(self.mesh.devices.flat) > 1:
            train_state, carry = mesh_lib.shard_train_inputs(
                self.mesh, train_state, carry)
        return train_state, carry

    def _fresh_carry(self, env_states, obs):
        N, M = self.N, self.num_agents
        return {
            "env_states": env_states,
            "obs": self._stack_obs(obs),
            "rnn_actor": jnp.zeros((N, M, self.cfg.recurrent_N,
                                    self.cfg.hidden_size)),
            "rnn_critic": jnp.zeros((N, M, self.cfg.recurrent_N,
                                     self.cfg.hidden_size)),
            "masks": jnp.ones((N, M, 1)),
        }

    def _stack_obs(self, obs_tuple):
        """tuple of per-agent [N, D] → [N, M, D] (homogeneous)."""
        return jnp.stack(obs_tuple, axis=1)

    def _share_obs(self, obs):
        """[N, M, D] → centralized critic input [N, M, M·D] (concat of all
        agents' obs tiled per agent — mpe_runner.py:86-88), or obs itself
        for decentralized V (IPPO)."""
        if not self.cfg.use_centralized_V:
            return obs
        N, M, D = obs.shape
        flat = obs.reshape(N, 1, M * D)
        return jnp.broadcast_to(flat, (N, M, M * D))

    # ---- one training episode (jitted) -------------------------------
    def _episode(self, train_state, carry, key):
        cfg = self.cfg
        N, M = self.N, self.num_agents
        BA = N * M
        flat = lambda x: x.reshape(BA, *x.shape[2:])
        unflat = lambda x: x.reshape(N, M, *x.shape[1:])

        def step_fn(c, step_key):
            k_act, k_env = jax.random.split(step_key)
            obs = c["obs"]
            share_obs = self._share_obs(obs)
            if cfg.use_critic_dedup:
                # share_obs is agent-invariant here (built by broadcast
                # in _share_obs) — run the critic once per ENV row and
                # broadcast the value (exact; config.use_critic_dedup)
                actions, logp, rnn_a = self.algo.actor.forward(
                    train_state.actor_params, flat(obs),
                    flat(c["rnn_actor"]), flat(c["masks"]), k_act)
                v_env, _ = self.algo.critic.forward(
                    train_state.critic_params, share_obs[:, 0],
                    c["rnn_critic"][:, 0], c["masks"][:, 0])
                values = jnp.broadcast_to(
                    v_env[:, None], (N, M, 1)).reshape(BA, 1)
                rnn_c = flat(c["rnn_critic"])
            else:
                values, actions, logp, rnn_a, rnn_c = self.algo.get_actions(
                    train_state, flat(share_obs), flat(obs),
                    flat(c["rnn_actor"]), flat(c["rnn_critic"]),
                    flat(c["masks"]), k_act)
            actions_env = unflat(actions)
            env_states, obs2, rewards, dones = self.envs.step(
                c["env_states"], actions_env, k_env)
            masks2 = 1.0 - dones[..., None].astype(jnp.float32)
            staged = {
                "share_obs": share_obs, "obs": obs,
                "rnn_states": c["rnn_actor"],
                "rnn_states_critic": c["rnn_critic"],
                "actions": actions_env,
                "action_log_probs": unflat(logp),
                "value_preds": unflat(values),
                "rewards": rewards,
                "masks": c["masks"],
                "active_masks": jnp.ones_like(c["masks"]),
            }
            c2 = {"env_states": env_states, "obs": self._stack_obs(obs2),
                  "rnn_actor": unflat(rnn_a), "rnn_critic": unflat(rnn_c),
                  "masks": masks2}
            return c2, staged

        key, k_scan, k_train = jax.random.split(key, 3)
        step_keys = jax.random.split(k_scan, cfg.episode_length)
        carry2, traj = jax.lax.scan(step_fn, carry, step_keys)

        last = {
            "share_obs": self._share_obs(carry2["obs"]),
            "obs": carry2["obs"],
            "rnn_states": carry2["rnn_actor"],
            "rnn_states_critic": carry2["rnn_critic"],
            "masks": carry2["masks"],
            "active_masks": jnp.ones_like(carry2["masks"]),
        }
        buf = buf_lib.from_rollout(traj, last)

        # bootstrap + GAE (base_runner.compute, :120-134)
        critic_in = (last["share_obs"] if self.algo.critic_reads == "share_obs"
                     else carry2["obs"])
        if cfg.use_critic_dedup:
            nv_env = self.algo.get_values(
                train_state, critic_in[:, 0], carry2["rnn_critic"][:, 0],
                carry2["masks"][:, 0])
            next_values = jnp.broadcast_to(nv_env[:, None], (N, M, 1))
        else:
            next_values = unflat(self.algo.get_values(
                train_state, flat(critic_in), flat(carry2["rnn_critic"]),
                flat(carry2["masks"])))
        buf = buf.compute_returns(
            next_values, train_state.vnorm, gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda, use_gae=cfg.use_gae,
            use_proper_time_limits=cfg.use_proper_time_limits)

        train_state, metrics = self.algo.train(train_state, buf, k_train)
        metrics["average_episode_rewards"] = (
            jnp.mean(buf.rewards) * cfg.episode_length)
        # per-agent means (`individual_rewards`, mpe_runner.py:62-75)
        per_agent = jnp.mean(buf.rewards, axis=(0, 1, 3))
        for i in range(M):
            metrics[f"agent{i}/individual_rewards"] = per_agent[i]
        return train_state, carry2, metrics

    # ---- evaluation (jitted) -----------------------------------------
    def _eval_episode(self, train_state, key):
        cfg = self.cfg
        env = self.eval_envs
        N, M = env.n_envs, self.num_agents
        BA = N * M
        flat = lambda x: x.reshape(BA, *x.shape[2:])
        unflat = lambda x: x.reshape(N, M, *x.shape[1:])
        key, k_reset = jax.random.split(key)
        env_states, obs = env.reset(k_reset)
        c = {"env_states": env_states, "obs": self._stack_obs(obs),
             "rnn": jnp.zeros((N, M, cfg.recurrent_N, cfg.hidden_size)),
             "masks": jnp.ones((N, M, 1))}

        def step_fn(c, step_key):
            actions, rnn = self.algo.act(
                train_state, flat(c["obs"]), flat(c["rnn"]), flat(c["masks"]),
                deterministic=True)
            env_states, obs2, rewards, dones = env.step(
                c["env_states"], unflat(actions), step_key)
            c = {"env_states": env_states, "obs": self._stack_obs(obs2),
                 "rnn": unflat(rnn),
                 "masks": 1.0 - dones[..., None].astype(jnp.float32)}
            return c, rewards

        _, rewards = jax.lax.scan(
            step_fn, c, jax.random.split(key, cfg.episode_length))
        return jnp.mean(jnp.sum(rewards, axis=0))  # per-episode return

    # ---- host training loop ------------------------------------------
    def run(self, key: Optional[jax.Array] = None, log_fn=print,
            save_dir=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        key, k_init = jax.random.split(key)
        train_state, carry = self.init(k_init)

        # exact resume (beyond the reference's weights-only restore,
        # base_runner.py:153-162): carry (incl. on-device env states) and
        # episode counter round-trip through the checkpoint's extra file
        start_episode = 0
        if getattr(self, "_restore_meta", None) is not None:
            start_episode, saved_key = self._restore_meta
            extra = ckpt_lib.restore_extra(cfg.model_dir, carry)
            if extra is not None:
                carry = jax.tree_util.tree_map(jnp.asarray, extra)
            if saved_key is not None:
                key = saved_key

        start = time.perf_counter()
        history = []
        E = max(cfg.episodes_per_call, 1)
        for episode in range(start_episode, self.episodes, E):
            key, k_ep = jax.random.split(key)
            trace_now = (cfg.profile_dir is not None and 2 <= episode < 2 + E)
            # capture one profiler trace on a post-compile episode
            with profiling.trace(cfg.profile_dir, enabled=trace_now):
                train_state, carry, metrics = self._multi_episode_fn(
                    train_state, carry, k_ep)
                if trace_now:
                    jax.block_until_ready(metrics["value_loss"])
            # eval fires on its own schedule, independent of logging
            eval_row = None
            if self._eval_fn is not None and cfg.use_eval \
                    and episode % cfg.eval_interval < E:
                key, k_ev = jax.random.split(key)
                eval_row = float(self._eval_fn(train_state, k_ev))
            if episode % cfg.log_interval < E or episode + E >= self.episodes:
                metrics = jax.device_get(metrics)
                total_steps = min(episode + E, self.episodes) \
                    * cfg.episode_length * self.N
                run_steps = (min(episode + E, self.episodes) - start_episode) \
                    * cfg.episode_length * self.N
                fps = run_steps / (time.perf_counter() - start)
                row = {"episode": episode, "steps": total_steps,
                       "fps": fps, **{k: float(v) for k, v in metrics.items()}}
                if eval_row is not None:
                    row["eval_average_episode_rewards"] = eval_row
                history.append(row)
                if log_fn is print:
                    print(f"ep {episode} steps {total_steps} "
                          f"fps {fps:,.0f} "
                          f"rew {row['average_episode_rewards']:.2f} "
                          f"vloss {row['value_loss']:.3f} "
                          f"ploss {row['policy_loss']:.3f}")
                elif log_fn is not None:
                    log_fn(row)
            elif eval_row is not None:
                row = {"episode": episode,
                       "eval_average_episode_rewards": eval_row}
                history.append(row)
                if log_fn not in (print, None):
                    log_fn(row)
            # save LAST so the checkpointed key reflects the eval split —
            # a resumed run then replays the uninterrupted key sequence
            if save_dir and (episode % max(cfg.save_interval, 1) < E
                             or episode + E >= self.episodes):
                ckpt_lib.save(save_dir, train_state,
                              step=min(episode + E, self.episodes), key=key,
                              extra=carry)
        return train_state, history
