"""Separated-policy runner for HOST envs (HAPPO/HATRPO on SMAC et al.).

Combines the host ingestion path (`host_runner.py`) with the per-agent
policies + HAPPO sequential factor update of the device separated runner
(`separated_runner.py`); parity target is the reference's
`runner/separated/smac_runner.py` + `separated/base_runner.py:135-183`.

Agents must share obs/action dims (the SMAC case); each still has its
own parameters, optimizer, and normalizer. Collection runs one jitted
per-agent forward pass per step; the update slices each agent's
singleton-agent buffer view and runs the (HA)PPO/TRPO trainers with the
running factor, agent order re-drawn on host each episode.
"""
from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.happo import HAPPO
from onpolicy_tpu.algorithms.hatrpo import HATRPO
from onpolicy_tpu.algorithms.mappo import MAPPO
from onpolicy_tpu.runner import host_mesh
from onpolicy_tpu.utils import spaces as sp


class HostSeparatedRunner:
    def __init__(self, cfg, vec_env, eval_env=None,
                 env_metrics: Optional[Callable] = None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.envs = vec_env
        self.eval_envs = eval_env
        self.num_agents = M = vec_env.num_agents
        self.N = vec_env.n_envs
        self.env_metrics = env_metrics
        self.episodes = int(cfg.num_env_steps) // cfg.episode_length // self.N

        def spc(s):
            s = s[0] if isinstance(s, (list, tuple)) else s
            return s if isinstance(s, (sp.Discrete, sp.Box, sp.MultiDiscrete,
                                       sp.MultiBinary)) else sp.from_gym(s)
        obs_space = spc(vec_env.observation_space)
        share_space = spc(vec_env.share_observation_space) \
            if cfg.use_centralized_V else obs_space
        self.act_space = spc(vec_env.action_space)
        Algo = {"happo": HAPPO, "hatrpo": HATRPO}.get(cfg.algorithm_name,
                                                      MAPPO)
        self.algos: List[MAPPO] = [
            Algo(cfg, obs_space, share_space, self.act_space,
                 total_updates=self.episodes) for _ in range(M)]
        self.is_happo = cfg.algorithm_name in ("happo", "hatrpo")

        # multi-chip: same sharded-ingestion story as HostSharedRunner
        # (params replicated, episode buffer env-sharded along 'data')
        self.mesh = host_mesh.make_host_mesh(cfg, self.N)

        self._act_fn = jax.jit(self._act_all)
        self._train_cache = {}

    # ---- jitted per-agent forward over the whole fleet ---------------
    def _act_all(self, states, share_obs, obs, rnn_a, rnn_c, masks, key,
                 avail):
        """All arrays [N, M, ...] → stacked per-agent outputs."""
        keys = jax.random.split(key, self.num_agents)
        vals, acts, lps, ras, rcs = [], [], [], [], []
        for i, algo in enumerate(self.algos):
            av = avail[:, i] if avail is not None else None
            v, a, lp, ra, rc = algo.get_actions(
                states[i], share_obs[:, i], obs[:, i], rnn_a[:, i],
                rnn_c[:, i], masks[:, i], keys[i], av)
            vals.append(v); acts.append(a); lps.append(lp)
            ras.append(ra); rcs.append(rc)
        st = lambda xs: jnp.stack(xs, axis=1)
        return st(vals), st(acts), st(lps), st(ras), st(rcs)

    def _train(self, order, states, buf, key):
        """Sequential per-agent update with the HAPPO factor."""
        if (order, True) not in self._train_cache:
            def fn(states, buf, key):
                cfg = self.cfg
                N, T = self.N, cfg.episode_length
                states = list(states)
                metrics = {}
                tkeys = jax.random.split(key, self.num_agents)
                factor = jnp.ones((T, N, 1, 1))
                for i in order:
                    buf_i = jax.tree_util.tree_map(
                        lambda x: x[:, :, i:i + 1]
                        if x is not None and x.ndim >= 3 else x, buf)
                    if self.is_happo:
                        old = self.algos[i].evaluate_full_logp(states[i],
                                                               buf_i)
                        states[i], m = self.algos[i].train(
                            states[i], buf_i, tkeys[i], factor=factor)
                        new = self.algos[i].evaluate_full_logp(states[i],
                                                               buf_i)
                        factor = factor * jnp.exp(
                            jnp.sum(new - old, axis=-1, keepdims=True))
                    else:
                        states[i], m = self.algos[i].train(states[i], buf_i,
                                                           tkeys[i])
                    metrics[f"agent{i}"] = m
                return tuple(states), metrics
            self._train_cache[(order, True)] = jax.jit(fn)
        return self._train_cache[(order, True)](states, buf, key)

    # ------------------------------------------------------------------
    def run_episode(self, states, start, key, order):
        cfg = self.cfg
        N, M, T = self.N, self.num_agents, cfg.episode_length
        obs, share_obs, avail = start["obs"], start["share_obs"], \
            start["avail"]
        rnn_a = start.get("rnn_a", np.zeros(
            (N, M, cfg.recurrent_N, cfg.hidden_size), np.float32))
        rnn_c = start.get("rnn_c", np.zeros_like(rnn_a))
        masks = start.get("masks", np.ones((N, M, 1), np.float32))
        active = start.get("active", np.ones((N, M, 1), np.float32))
        bad = start.get("bad", np.ones((N, M, 1), np.float32))

        stage = {k: [] for k in
                 ("share_obs", "obs", "rnn_states", "rnn_states_critic",
                  "actions", "action_log_probs", "value_preds", "rewards",
                  "masks", "active_masks", "bad_masks", "available_actions")}
        infos_tail = []
        keys = np.asarray(jax.random.split(key, T + 2))
        act_states = getattr(self, "_act_states", states)
        for t in range(T):
            values, actions, logp, rnn_a2, rnn_c2 = self._act_fn(
                act_states, jnp.asarray(share_obs), jnp.asarray(obs),
                jnp.asarray(rnn_a), jnp.asarray(rnn_c), jnp.asarray(masks),
                keys[t], jnp.asarray(avail) if avail is not None else None)
            actions_np = np.asarray(actions)
            stage["share_obs"].append(np.asarray(share_obs, np.float32))
            stage["obs"].append(np.asarray(obs, np.float32))
            stage["rnn_states"].append(rnn_a.copy())
            stage["rnn_states_critic"].append(rnn_c.copy())
            stage["actions"].append(actions_np)
            stage["action_log_probs"].append(np.asarray(logp))
            stage["value_preds"].append(np.asarray(values))
            stage["masks"].append(masks.copy())
            stage["active_masks"].append(active.copy())
            stage["bad_masks"].append(bad.copy())
            if avail is not None:
                stage["available_actions"].append(
                    np.asarray(avail, np.float32))

            out = self.envs.step(actions_np)
            obs, share_obs, rewards, dones, infos, avail = out
            if not cfg.use_centralized_V:
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
                im = info[0] if isinstance(info, (list, tuple)) else info
                if isinstance(im, dict) and im.get("bad_transition"):
                    bad[n] = 0.0
            stage["rewards"].append(np.asarray(rewards, np.float32
                                               ).reshape(N, M, 1))
            rnn_a = np.array(rnn_a2) * masks[..., None]
            rnn_c = np.array(rnn_c2) * masks[..., None]

        # one batched transfer per episode; env axis sharded along
        # 'data' on a mesh (host_mesh.put_*), plain device_put otherwise
        traj = host_mesh.put_traj(
            self.mesh, {k: np.stack(v) for k, v in stage.items() if v})
        last_np = {
            "share_obs": np.asarray(share_obs, np.float32),
            "obs": np.asarray(obs, np.float32),
            "rnn_states": np.asarray(rnn_a),
            "rnn_states_critic": np.asarray(rnn_c),
            "masks": masks,
            "active_masks": active,
            "bad_masks": bad,
        }
        if avail is not None:
            last_np["available_actions"] = np.asarray(avail, np.float32)
        last = host_mesh.put_last(self.mesh, last_np)
        buf = buf_lib.from_rollout(traj, last)

        # per-agent bootstrap + GAE over the full [T,N,M] buffer
        next_vals = []
        for i, algo in enumerate(self.algos):
            nv = algo.get_values(states[i], last["share_obs"][:, i],
                                 last["rnn_states_critic"][:, i],
                                 last["masks"][:, i])
            next_vals.append(nv)
        buf = buf.compute_returns(
            jnp.stack(next_vals, axis=1), states[0].vnorm, gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda, use_gae=cfg.use_gae,
            use_proper_time_limits=cfg.use_proper_time_limits)

        states, metrics = self._train(order, states, buf, keys[T + 1])
        # per-process act-path params for multi-host (host_mesh)
        self._act_states = host_mesh.act_state(self.mesh, states)
        metrics = jax.device_get(metrics)
        flat = {"average_step_rewards":
                float(np.mean(np.stack(stage["rewards"])))}
        for i in range(M):
            for k, v in metrics[f"agent{i}"].items():
                flat[f"agent{i}/{k}"] = float(v)
        if self.env_metrics is not None:
            flat.update(self.env_metrics(infos_tail))
        start2 = {"obs": obs, "share_obs": share_obs, "avail": avail,
                  "rnn_a": rnn_a, "rnn_c": rnn_c, "masks": masks,
                  "active": active, "bad": bad}
        return states, start2, flat

    # ---- deterministic evaluation (separated/smac_runner.py eval) ----
    def evaluate(self, states, key=None, eval_episodes=None):
        cfg = self.cfg
        env = self.eval_envs or self.envs
        # multi-host: act on the process-local param copy (host_mesh)
        if self.mesh is not None and jax.process_count() > 1:
            acts = getattr(self, "_act_states", None)
            states = acts if acts is not None else states
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + 5)
        eval_episodes = eval_episodes or cfg.eval_episodes
        N, M = env.n_envs, self.num_agents
        obs, share_obs, avail = env.reset()
        rnn = np.zeros((N, M, cfg.recurrent_N, cfg.hidden_size), np.float32)
        masks = np.ones((N, M, 1), np.float32)
        ep_rewards, wins, acc = [], [], np.zeros(N)
        if not hasattr(self, "_eval_act"):
            def act_all(states, obs, rnn, masks, avail):
                outs = []
                for i, algo in enumerate(self.algos):
                    av = avail[:, i] if avail is not None else None
                    a, r = algo.act(states[i], obs[:, i], rnn[:, i],
                                    masks[:, i], available_actions=av,
                                    deterministic=True)
                    outs.append((a, r))
                return (jnp.stack([o[0] for o in outs], 1),
                        jnp.stack([o[1] for o in outs], 1))
            self._eval_act = jax.jit(act_all)
        guard = 0
        while len(ep_rewards) < eval_episodes and guard < 100000:
            guard += 1
            actions, rnn_j = self._eval_act(
                states, jnp.asarray(obs), jnp.asarray(rnn),
                jnp.asarray(masks),
                jnp.asarray(avail) if avail is not None else None)
            obs, share_obs, rewards, dones, infos, avail = env.step(
                np.asarray(actions))
            acc += np.asarray(rewards).reshape(N, M, 1).mean(axis=(1, 2))
            dones = np.asarray(dones).reshape(N, M)
            dones_env = dones.all(axis=1)
            rnn = np.array(rnn_j)
            rnn[dones_env] = 0.0
            masks = np.ones((N, M, 1), np.float32)
            masks[dones_env] = 0.0
            for n in np.flatnonzero(dones_env):
                ep_rewards.append(acc[n])
                acc[n] = 0.0
                im = infos[n][0] if isinstance(infos[n], (list, tuple)) \
                    else infos[n]
                if isinstance(im, dict) and "won" in im:
                    wins.append(1.0 if im["won"] else 0.0)
        result = {"eval_average_episode_rewards":
                  float(np.mean(ep_rewards)) if ep_rewards else 0.0}
        if wins:
            result["eval_win_rate"] = float(np.mean(wins))
        return result

    def run(self, key=None, log_fn=print, save_dir=None):
        from onpolicy_tpu.utils import checkpoint as ckpt_lib
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        key, k0 = jax.random.split(key)
        states = tuple(a.init_state(jax.random.fold_in(k0, i))
                       for i, a in enumerate(self.algos))
        restore_meta = None
        if cfg.model_dir:
            restored, step, rkey = ckpt_lib.restore(cfg.model_dir, states)
            states = jax.tree_util.tree_map(jnp.asarray, restored)
            restore_meta = (step, rkey)
        states = host_mesh.shard_state(self.mesh, states)
        self._act_states = host_mesh.act_state(self.mesh, states)
        out = self.envs.reset()
        obs, share_obs, avail = out
        if not cfg.use_centralized_V:
            share_obs = obs
        N, M = self.N, self.num_agents
        start = {"obs": np.asarray(obs), "share_obs": np.asarray(share_obs),
                 "avail": None if avail is None else np.asarray(avail),
                 "rnn_a": np.zeros((N, M, cfg.recurrent_N, cfg.hidden_size),
                                   np.float32),
                 "rnn_c": np.zeros((N, M, cfg.recurrent_N, cfg.hidden_size),
                                   np.float32),
                 "masks": np.ones((N, M, 1), np.float32),
                 "active": np.ones((N, M, 1), np.float32),
                 "bad": np.ones((N, M, 1), np.float32)}
        # exact resume — shared protocol (runner/host_resume.py) plus
        # replaying the host-drawn HAPPO order stream
        from onpolicy_tpu.runner import host_resume
        start, key, start_episode = host_resume.restore_run_state(
            cfg, start, restore_meta, key)
        rng = np.random.default_rng(cfg.seed)
        if self.is_happo:
            for _ in range(start_episode):
                rng.permutation(self.num_agents)
        resumed_steps = start_episode * cfg.episode_length * self.N

        t0 = time.perf_counter()
        history = []
        for ep in range(start_episode, self.episodes):
            key, k = jax.random.split(key)
            order = tuple(int(x) for x in rng.permutation(self.num_agents)) \
                if self.is_happo else tuple(range(self.num_agents))
            states, start, metrics = self.run_episode(states, start, k, order)
            if cfg.use_eval and self.eval_envs is not None \
                    and ep % cfg.eval_interval == 0:
                key, k_ev = jax.random.split(key)
                metrics.update(self.evaluate(states, k_ev))
            # save LAST so the checkpointed key reflects the eval split
            if save_dir and (ep % max(cfg.save_interval, 1) == 0
                             or ep == self.episodes - 1):
                host_resume.save_run_state(save_dir, states, ep, key,
                                           start)
            if ep % cfg.log_interval == 0 or ep == self.episodes - 1:
                steps = (ep + 1) * cfg.episode_length * self.N
                row = {"episode": ep, "steps": steps,
                       "fps": (steps - resumed_steps)
                       / (time.perf_counter() - t0), **metrics}
                history.append(row)
                if log_fn is print:
                    print(f"ep {ep} steps {steps} "
                          f"rew {row['average_step_rewards']:.3f}")
                elif log_fn is not None:
                    log_fn(row)
        return states, history
