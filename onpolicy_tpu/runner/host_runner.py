"""Shared-policy runner for HOST-side envs (SMAC / SMACv2 / GRF / …).

The pure-JAX runner (`shared_runner.py`) keeps envs on device; external
simulators can't go there, so this runner implements the batched
host-to-device ingestion path (SURVEY §5.8): per step, one device call
computes actions for all envs·agents (jitted `get_actions`), the
shared-memory env pool steps in parallel host processes, and per-step
outputs are staged into preallocated numpy blocks. After T steps the
whole rollout transfers to device ONCE and the jitted
compute_returns + PPO update runs unchanged (same `RolloutBuffer`,
same trainers as the on-device path).

Mask semantics reproduce `runner/shared/smac_runner.py:129-151`:
  dones_env = all-agents-done; masks[t+1]=0 on env termination;
  active_masks zeroed per dead agent but re-set to 1 on env reset;
  bad_masks from info["bad_transition"] (episode-limit truncation).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.mappo import MAPPO
from onpolicy_tpu.algorithms.mat import MAT
from onpolicy_tpu.runner import host_mesh, host_resume
from onpolicy_tpu.utils import checkpoint as ckpt_lib
from onpolicy_tpu.utils import spaces as sp


class HostSharedRunner:
    def __init__(self, cfg, vec_env, eval_env=None,
                 env_metrics: Optional[Callable] = None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.envs = vec_env
        self.eval_envs = eval_env
        self.num_agents = M = vec_env.num_agents
        self.N = vec_env.n_envs
        self.env_metrics = env_metrics

        obs_space = self._space(vec_env.observation_space)
        share_space = self._space(vec_env.share_observation_space) \
            if cfg.use_centralized_V else obs_space
        self.act_space = self._space(vec_env.action_space)
        self.has_avail = isinstance(self.act_space, sp.Discrete)

        self.episodes = int(cfg.num_env_steps) // cfg.episode_length // self.N
        if cfg.algorithm_name in ("mat", "mat_dec"):
            self.algo = MAT(cfg, obs_space, share_space, self.act_space,
                            total_updates=self.episodes, num_agents=M)
        else:
            self.algo = MAPPO(cfg, obs_space, share_space, self.act_space,
                              total_updates=self.episodes)

        # multi-chip: params replicated (or model-sharded), episode
        # buffer env-axis sharded along 'data', grad/normalizer psums
        # inserted by XLA under jit (runner/host_mesh.py; SURVEY §5.8)
        self.mesh = host_mesh.make_host_mesh(cfg, self.N)

        self._act_fn = jax.jit(self.algo.get_actions)
        self._act_det_fn = jax.jit(
            lambda st, o, r, m, k, av: self.algo.act(
                st, o, r, m, k, av, deterministic=True))
        self._train_fn = jax.jit(self._compute_and_train)

    @staticmethod
    def _space(space):
        """Accept a list of per-agent spaces (reference layout) or one."""
        if isinstance(space, (list, tuple)):
            space = space[0]
        if not isinstance(space, (sp.Discrete, sp.Box, sp.MultiDiscrete,
                                  sp.MultiBinary, sp.MixedSpace)):
            space = sp.from_gym(space)
        return space

    # ------------------------------------------------------------------
    def init(self, key):
        cfg = self.cfg
        train_state = self.algo.init_state(key)
        self._restore_meta = None          # (step, key) when resuming
        if cfg.model_dir:
            restored, step, rkey = ckpt_lib.restore(cfg.model_dir,
                                                    train_state)
            train_state = jax.tree_util.tree_map(jnp.asarray, restored)
            self._restore_meta = (step, rkey)
        train_state = host_mesh.shard_state(self.mesh, train_state)
        # per-process act-path params (multi-host; == train_state else)
        self._act_ts = host_mesh.act_state(self.mesh, train_state)
        out = self.envs.reset()
        if isinstance(out, tuple) and len(out) == 3:
            obs, share_obs, avail = out
        else:
            obs = np.asarray(out)
            share_obs = np.tile(obs.reshape(self.N, 1, -1),
                                (1, self.num_agents, 1))
            avail = None
        if not self.cfg.use_centralized_V:
            share_obs = obs
        N, M, BA = self.N, self.num_agents, self.N * self.num_agents
        # full staging carry from the start so a checkpointed carry and
        # a fresh one share one pytree structure (exact host resume)
        return train_state, {
            "obs": np.asarray(obs), "share_obs": np.asarray(share_obs),
            "avail": None if avail is None else np.asarray(avail),
            "rnn_a": np.zeros((BA, cfg.recurrent_N, cfg.hidden_size),
                              np.float32),
            "rnn_c": np.zeros((BA, cfg.recurrent_N, cfg.hidden_size),
                              np.float32),
            "masks": np.ones((N, M, 1), np.float32),
            "active": np.ones((N, M, 1), np.float32),
            "bad": np.ones((N, M, 1), np.float32)}

    def _compute_and_train(self, train_state, buf, next_values, key):
        cfg = self.cfg
        buf = buf.compute_returns(
            next_values, train_state.vnorm, gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda, use_gae=cfg.use_gae,
            use_proper_time_limits=cfg.use_proper_time_limits)
        return self.algo.train(train_state, buf, key)

    def run_episode(self, train_state, start, key):
        """Collect T steps + train. Returns (train_state, start', metrics)."""
        cfg = self.cfg
        N, M, T = self.N, self.num_agents, cfg.episode_length
        BA = N * M
        flat = lambda x: np.asarray(x, np.float32).reshape(BA, *np.shape(x)[2:])

        obs, share_obs, avail = start["obs"], start["share_obs"], start["avail"]
        rnn_a = np.zeros((BA, cfg.recurrent_N, cfg.hidden_size), np.float32) \
            if "rnn_a" not in start else start["rnn_a"]
        rnn_c = np.zeros_like(rnn_a) if "rnn_c" not in start \
            else start["rnn_c"]
        masks = start.get("masks", np.ones((N, M, 1), np.float32))
        active = start.get("active", np.ones((N, M, 1), np.float32))
        bad = start.get("bad", np.ones((N, M, 1), np.float32))

        stage = {k: [] for k in
                 ("share_obs", "obs", "rnn_states", "rnn_states_critic",
                  "actions", "action_log_probs", "value_preds", "rewards",
                  "masks", "active_masks", "bad_masks", "available_actions")}
        infos_tail = []
        key_np = np.asarray(jax.random.split(key, T + 1))

        act_ts = getattr(self, "_act_ts", train_state)
        for t in range(T):
            values, actions, logp, rnn_a2, rnn_c2 = self._act_fn(
                act_ts, flat(share_obs), flat(obs), rnn_a, rnn_c,
                flat(masks), key_np[t],
                flat(avail) if avail is not None else None)
            actions_np = np.asarray(actions).reshape(N, M, -1)

            # double-buffering: kick the env pool immediately, stage the
            # step's inputs while workers simulate (host_vec step_async)
            async_pool = hasattr(self.envs, "step_async")
            if async_pool:
                self.envs.step_async(actions_np)

            stage["share_obs"].append(np.asarray(share_obs, np.float32))
            stage["obs"].append(np.asarray(obs, np.float32))
            stage["rnn_states"].append(
                np.asarray(rnn_a).reshape(N, M, cfg.recurrent_N, -1))
            stage["rnn_states_critic"].append(
                np.asarray(rnn_c).reshape(N, M, cfg.recurrent_N, -1))
            stage["actions"].append(actions_np)
            stage["action_log_probs"].append(
                np.asarray(logp).reshape(N, M, -1))
            stage["value_preds"].append(
                np.asarray(values).reshape(N, M, 1))
            stage["masks"].append(masks.copy())
            stage["active_masks"].append(active.copy())
            stage["bad_masks"].append(bad.copy())
            if avail is not None:
                stage["available_actions"].append(
                    np.asarray(avail, np.float32))

            out = self.envs.step_wait() if async_pool \
                else self.envs.step(actions_np)
            if len(out) == 6:
                obs, share_obs, rewards, dones, infos, avail = out
            else:
                obs, rewards, dones, infos = out
                share_obs = np.tile(obs.reshape(N, 1, -1), (1, M, 1))
                avail = None
            if not self.cfg.use_centralized_V:
                share_obs = obs
            infos_tail = infos

            dones = np.asarray(dones).reshape(N, M)
            dones_env = dones.all(axis=1)
            masks = np.ones((N, M, 1), np.float32)
            masks[dones_env] = 0.0
            active = np.ones((N, M, 1), np.float32)
            active[dones] = 0.0
            active[dones_env] = 1.0
            bad = np.ones((N, M, 1), np.float32)
            for n, info in enumerate(infos):
                if isinstance(info, (list, tuple)):
                    for m, im in enumerate(info):
                        if isinstance(im, dict) and im.get("bad_transition"):
                            bad[n, m] = 0.0
                elif isinstance(info, dict) and info.get("bad_transition"):
                    bad[n] = 0.0
            stage["rewards"].append(np.asarray(rewards, np.float32
                                               ).reshape(N, M, 1))
            rnn_a, rnn_c = rnn_a2, rnn_c2
            # zero recurrent state on env termination (smac_runner:129-137)
            rnn_mask = masks.reshape(BA, 1, 1)
            rnn_a = rnn_a * rnn_mask
            rnn_c = rnn_c * rnn_mask

        # one batched transfer per episode; env axis sharded along
        # 'data' on a mesh (host_mesh.put_*), plain device_put otherwise
        traj = host_mesh.put_traj(
            self.mesh, {k: np.stack(v) for k, v in stage.items() if v})
        last_np = {
            "share_obs": np.asarray(share_obs, np.float32),
            "obs": np.asarray(obs, np.float32),
            "rnn_states": np.asarray(rnn_a).reshape(
                N, M, cfg.recurrent_N, -1),
            "rnn_states_critic": np.asarray(rnn_c).reshape(
                N, M, cfg.recurrent_N, -1),
            "masks": masks,
            "active_masks": active,
            "bad_masks": bad,
        }
        if avail is not None:
            last_np["available_actions"] = np.asarray(avail, np.float32)
        last = host_mesh.put_last(self.mesh, last_np)
        buf = buf_lib.from_rollout(traj, last)

        critic_in = last["share_obs"] if self.algo.critic_reads == "share_obs" \
            else last["obs"]
        n_glob = last["share_obs"].shape[0]      # == N × process_count
        ba_glob = n_glob * M
        next_values = self.algo.get_values(
            train_state, critic_in.reshape(ba_glob, -1),
            last["rnn_states_critic"].reshape(ba_glob, cfg.recurrent_N, -1),
            last["masks"].reshape(ba_glob, 1)).reshape(n_glob, M, 1)

        train_state, metrics = self._train_fn(
            train_state, buf, next_values, jnp.asarray(key_np[T]))
        self._act_ts = host_mesh.act_state(self.mesh, train_state)
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        metrics["average_step_rewards"] = float(np.mean(np.stack(
            stage["rewards"])))
        metrics["dead_ratio"] = 1.0 - float(
            np.mean(np.stack(stage["active_masks"])))
        if self.env_metrics is not None:
            metrics.update(self.env_metrics(infos_tail))

        start2 = {"obs": obs, "share_obs": share_obs, "avail": avail,
                  "rnn_a": rnn_a, "rnn_c": rnn_c, "masks": masks,
                  "active": active, "bad": bad}
        return train_state, start2, metrics

    # ------------------------------------------------------------------
    def evaluate(self, train_state, key=None, eval_episodes=None):
        """Deterministic evaluation on `eval_envs` until `eval_episodes`
        episodes complete; returns eval_win_rate + mean episode rewards
        (`smac_runner.eval`, :161-223)."""
        cfg = self.cfg
        env = self.eval_envs or self.envs
        N, M = env.n_envs, self.num_agents
        BA = N * M
        eval_episodes = eval_episodes or cfg.eval_episodes
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + 50000)
        # multi-host: act on a process-local copy of the CALLER'S state
        # (deriving it here, not substituting the cached post-train
        # _act_ts, so evaluating a restored/older state uses that state
        # — ADVICE round 4)
        if self.mesh is not None and jax.process_count() > 1:
            from onpolicy_tpu.runner import host_mesh
            train_state = host_mesh.act_state(self.mesh, train_state)
        out = env.reset()
        if isinstance(out, tuple) and len(out) == 3:
            obs, _, avail = out
        else:
            obs, avail = np.asarray(out), None
        rnn = np.zeros((BA, cfg.recurrent_N, cfg.hidden_size), np.float32)
        masks = np.ones((BA, 1), np.float32)
        flat = lambda x: np.asarray(x, np.float32).reshape(
            BA, *np.shape(x)[2:])
        wins, ep_rewards, acc = [], [], np.zeros(N)
        guard = 0
        while len(ep_rewards) < eval_episodes and guard < 100000:
            guard += 1
            key, k = jax.random.split(key)
            actions, rnn_out = self._act_det_fn(
                train_state, flat(obs), rnn, masks, k,
                flat(avail) if avail is not None else None)
            rnn = np.array(rnn_out)
            out = env.step(np.asarray(actions).reshape(N, M, -1))
            if len(out) == 6:
                obs, _, rewards, dones, infos, avail = out
            else:
                obs, rewards, dones, infos = out
                avail = None
            acc += np.asarray(rewards).reshape(N, M).mean(-1)
            dones = np.asarray(dones).reshape(N, M)
            done_env = dones.all(axis=1)
            masks = np.repeat(1.0 - done_env[:, None].astype(np.float32),
                              M, axis=0).reshape(BA, 1)
            rnn[np.repeat(done_env, M)] = 0.0
            for n in np.nonzero(done_env)[0]:
                ep_rewards.append(acc[n])
                acc[n] = 0.0
                info = infos[n][0] if isinstance(infos[n], (list, tuple)) \
                    else infos[n]
                if isinstance(info, dict) and "won" in info:
                    wins.append(1.0 if info["won"] else 0.0)
        result = {"eval_average_episode_rewards":
                  float(np.mean(ep_rewards)) if ep_rewards else 0.0}
        if wins:
            result["eval_win_rate"] = float(np.mean(wins))
        return result

    def run(self, key=None, log_fn=print, save_dir=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        key, k0 = jax.random.split(key)
        train_state, start = self.init(k0)

        # exact resume — shared protocol (runner/host_resume.py)
        start, key, start_episode = host_resume.restore_run_state(
            cfg, start, getattr(self, "_restore_meta", None), key)
        resumed_steps = start_episode * cfg.episode_length * self.N

        t0 = time.perf_counter()
        history = []
        for ep in range(start_episode, self.episodes):
            key, k = jax.random.split(key)
            train_state, start, metrics = self.run_episode(train_state,
                                                           start, k)
            if cfg.use_eval and self.eval_envs is not None \
                    and ep % cfg.eval_interval == 0:
                key, k_ev = jax.random.split(key)
                metrics.update(self.evaluate(train_state, k_ev))
            # save LAST so the checkpointed key reflects the eval split
            if save_dir and (ep % max(cfg.save_interval, 1) == 0
                             or ep == self.episodes - 1):
                host_resume.save_run_state(save_dir, train_state, ep,
                                           key, start)
            if ep % cfg.log_interval == 0 or ep == self.episodes - 1:
                steps = (ep + 1) * cfg.episode_length * self.N
                row = {"episode": ep, "steps": steps,
                       "fps": (steps - resumed_steps)
                       / (time.perf_counter() - t0), **metrics}
                history.append(row)
                if log_fn is print:
                    print(f"ep {ep} steps {steps} fps {row['fps']:,.0f} "
                          f"step_rew {row['average_step_rewards']:.3f}")
                elif log_fn is not None:
                    log_fn(row)
        return train_state, history
