"""Separated-policy runner: per-agent networks (heterogeneous spaces)
with optional HAPPO sequential updates.

Re-derivation of `/root/reference/onpolicy/runner/separated/
{base_runner,mpe_runner}.py`. Per-agent policies are independent
Actor/Critic pairs over their own spaces (speaker vs listener have
different obs AND action spaces); the per-agent loop unrolls inside one
jitted episode program — M is small, so the unrolled graph stays cheap,
and collection/GAE/updates remain a single device program.

Per-agent buffers reuse `RolloutBuffer` with a singleton agent axis
(`SeparatedReplayBuffer` is the reference's M-free variant).

HAPPO/HATRPO sequential update (base_runner.py:135-183): agents update
one at a time in a random order; after each agent, the running `factor`
is multiplied by Π exp(new_logp − old_logp) evaluated over the whole
episode, and the next agent's surrogate is weighted by it. The random
order is drawn ON HOST per episode and passed as a static argument —
each distinct order jit-caches its own executable (fine for the small
M of heterogeneous envs; homogeneous large-M fleets should prefer the
shared policy path).
"""
from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.happo import HAPPO
from onpolicy_tpu.algorithms.hatrpo import HATRPO
from onpolicy_tpu.algorithms.mappo import MAPPO
from onpolicy_tpu.envs.mpe import make_vec_env
from onpolicy_tpu.parallel import mesh as mesh_lib
from onpolicy_tpu.utils import checkpoint as ckpt_lib
from onpolicy_tpu.utils import spaces as sp


class SeparatedRunner:
    def __init__(self, cfg, vec_env=None, eval_env=None):
        cfg = cfg.validate()
        self.cfg = cfg
        self.envs = vec_env if vec_env is not None else make_vec_env(cfg)
        self.eval_envs = eval_env
        self.num_agents = M = self.envs.num_agents
        self.N = self.envs.n_envs
        self.episodes = int(cfg.num_env_steps) // cfg.episode_length // self.N

        Algo = {"happo": HAPPO, "hatrpo": HATRPO}.get(cfg.algorithm_name,
                                                      MAPPO)
        self.algos: List[MAPPO] = []
        share_dim = sum(sp.obs_shape(s)[0]
                        for s in self.envs.observation_space)
        for i in range(M):
            obs_space = self.envs.observation_space[i]
            share_space = (sp.Box((share_dim,)) if cfg.use_centralized_V
                           else obs_space)
            self.algos.append(Algo(cfg, obs_space, share_space,
                                   self.envs.action_space[i],
                                   total_updates=self.episodes))
        self.is_happo = cfg.algorithm_name in ("happo", "hatrpo")
        self._episode_cache = {}
        self.mesh = mesh_lib.make_mesh(cfg.mesh_shape)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array):
        keys = jax.random.split(key, self.num_agents + 1)
        states = tuple(a.init_state(k) for a, k in zip(self.algos, keys[:-1]))
        if self.cfg.model_dir:
            restored, _, _ = ckpt_lib.restore(self.cfg.model_dir, states)
            states = jax.tree_util.tree_map(jnp.asarray, restored)
        env_states, obs = self.envs.reset(keys[-1])
        N, L, H = self.N, self.cfg.recurrent_N, self.cfg.hidden_size
        carry = {
            "env_states": env_states,
            "obs": tuple(obs),
            "rnn_actor": tuple(jnp.zeros((N, L, H)) for _ in range(self.num_agents)),
            "rnn_critic": tuple(jnp.zeros((N, L, H)) for _ in range(self.num_agents)),
            "masks": jnp.ones((N, 1)),
        }
        if len(self.mesh.devices.flat) > 1:
            # same placement as the shared path: per-agent param stacks
            # replicated (or model-sharded on a 2-D mesh), env batch
            # sharded along 'data'
            states, carry = mesh_lib.shard_train_inputs(self.mesh, states,
                                                        carry)
            states = tuple(states)
        return states, carry

    def _share_obs(self, obs_tuple):
        """Concat of all agents' obs [N, ΣD] (separated/mpe_runner:86-89)."""
        return jnp.concatenate(obs_tuple, axis=-1)

    # ---- one jitted episode, parameterized by static update order ----
    def _episode(self, order: Tuple[int, ...], states, carry, key):
        cfg = self.cfg
        N, M = self.N, self.num_agents
        max_heads = max(sp.action_storage_dim(s)
                        for s in self.envs.action_space)

        def step_fn(c, step_key):
            keys = jax.random.split(step_key, M + 1)
            share_obs = self._share_obs(c["obs"]) if cfg.use_centralized_V \
                else None
            staged, env_actions = [], []
            rnn_a2, rnn_c2 = [], []
            for i in range(M):
                so = share_obs if share_obs is not None else c["obs"][i]
                values, actions, logp, ra, rc = self.algos[i].get_actions(
                    states[i], so, c["obs"][i], c["rnn_actor"][i],
                    c["rnn_critic"][i], c["masks"], keys[i])
                pad = max_heads - actions.shape[-1]
                env_actions.append(jnp.pad(actions, ((0, 0), (0, pad))))
                rnn_a2.append(ra)
                rnn_c2.append(rc)
                staged.append({
                    "share_obs": so, "obs": c["obs"][i],
                    "rnn_states": c["rnn_actor"][i],
                    "rnn_states_critic": c["rnn_critic"][i],
                    "actions": actions, "action_log_probs": logp,
                    "value_preds": values,
                    "masks": c["masks"],
                    "active_masks": jnp.ones_like(c["masks"]),
                })
            acts = jnp.stack(env_actions, axis=1)          # [N, M, maxH]
            env_states, obs2, rewards, dones = self.envs.step(
                c["env_states"], acts, keys[-1])
            masks2 = 1.0 - dones[:, :1].astype(jnp.float32)
            for i in range(M):
                staged[i]["rewards"] = rewards[:, i]
            c2 = {"env_states": env_states, "obs": tuple(obs2),
                  "rnn_actor": tuple(rnn_a2), "rnn_critic": tuple(rnn_c2),
                  "masks": masks2}
            return c2, tuple(staged)

        key, k_scan, k_train = jax.random.split(key, 3)
        carry2, trajs = jax.lax.scan(
            step_fn, carry, jax.random.split(k_scan, cfg.episode_length))

        # per-agent buffers (singleton agent axis) + GAE
        share_last = self._share_obs(carry2["obs"]) if cfg.use_centralized_V \
            else None
        bufs = []
        for i in range(M):
            last = {
                "share_obs": share_last if share_last is not None
                else carry2["obs"][i],
                "obs": carry2["obs"][i],
                "rnn_states": carry2["rnn_actor"][i],
                "rnn_states_critic": carry2["rnn_critic"][i],
                "masks": carry2["masks"],
                "active_masks": jnp.ones_like(carry2["masks"]),
            }
            traj_i = jax.tree_util.tree_map(
                lambda x: x[:, :, None], dict(trajs[i]))
            last_i = jax.tree_util.tree_map(lambda x: x[:, None], last)
            buf = buf_lib.from_rollout(traj_i, last_i)
            next_value = self.algos[i].get_values(
                states[i], last["share_obs"], last["rnn_states_critic"],
                last["masks"])[:, None]
            buf = buf.compute_returns(
                next_value, states[i].vnorm, gamma=cfg.gamma,
                gae_lambda=cfg.gae_lambda, use_gae=cfg.use_gae,
                use_proper_time_limits=cfg.use_proper_time_limits)
            bufs.append(buf)

        # ---- update(s) ----------------------------------------------
        states = list(states)
        metrics = {}
        if self.is_happo:
            factor = jnp.ones((cfg.episode_length, N, 1, 1))
            tkeys = jax.random.split(k_train, M)
            for i in order:
                old_logp = self.algos[i].evaluate_full_logp(states[i], bufs[i])
                states[i], m = self.algos[i].train(states[i], bufs[i],
                                                   tkeys[i], factor=factor)
                new_logp = self.algos[i].evaluate_full_logp(states[i], bufs[i])
                factor = factor * jnp.exp(
                    jnp.sum(new_logp - old_logp, axis=-1, keepdims=True))
                metrics[f"agent{i}"] = m
        else:
            tkeys = jax.random.split(k_train, M)
            for i in range(M):
                states[i], m = self.algos[i].train(states[i], bufs[i],
                                                   tkeys[i])
                metrics[f"agent{i}"] = m

        rewards_all = jnp.stack([b.rewards for b in bufs], axis=2)
        metrics["average_episode_rewards"] = (
            jnp.mean(rewards_all) * cfg.episode_length)
        return tuple(states), carry2, metrics

    def _episode_fn(self, states, carry, key, order=None):
        order = tuple(order) if order is not None \
            else tuple(range(self.num_agents))
        if order not in self._episode_cache:
            self._episode_cache[order] = jax.jit(
                lambda s, c, k: self._episode(order, s, c, k))
        return self._episode_cache[order](states, carry, key)

    # ---- deterministic eval (jitted; separated/mpe_runner.py eval) ----
    def _eval_episode(self, states, key):
        cfg = self.cfg
        env = self.eval_envs
        N, M = env.n_envs, self.num_agents
        max_heads = max(sp.action_storage_dim(s)
                        for s in self.envs.action_space)
        key, k_reset = jax.random.split(key)
        env_states, obs = env.reset(k_reset)
        c = {"env_states": env_states, "obs": tuple(obs),
             "rnn": tuple(jnp.zeros((N, cfg.recurrent_N, cfg.hidden_size))
                          for _ in range(M)),
             "masks": jnp.ones((N, 1))}

        def step_fn(c, step_key):
            env_actions, rnn2 = [], []
            for i in range(M):
                actions, r = self.algos[i].act(
                    states[i], c["obs"][i], c["rnn"][i], c["masks"],
                    deterministic=True)
                pad = max_heads - actions.shape[-1]
                env_actions.append(jnp.pad(actions, ((0, 0), (0, pad))))
                rnn2.append(r)
            acts = jnp.stack(env_actions, axis=1)
            env_states, obs2, rewards, dones = env.step(
                c["env_states"], acts, step_key)
            masks = 1.0 - dones[:, :1].astype(jnp.float32)
            c = {"env_states": env_states, "obs": tuple(obs2),
                 "rnn": tuple(r * masks[:, None] for r in rnn2),
                 "masks": masks}
            return c, rewards

        _, rewards = jax.lax.scan(
            step_fn, c, jax.random.split(key, cfg.episode_length))
        return jnp.mean(jnp.sum(rewards, axis=0))

    # ---- host loop ----------------------------------------------------
    def run(self, key: Optional[jax.Array] = None, log_fn=print,
            save_dir=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        key, k_init = jax.random.split(key)
        states, carry = self.init(k_init)
        rng = np.random.default_rng(cfg.seed)

        start = time.perf_counter()
        history = []
        for episode in range(self.episodes):
            key, k_ep = jax.random.split(key)
            order = rng.permutation(self.num_agents) if self.is_happo \
                else None
            states, carry, metrics = self._episode_fn(states, carry, k_ep,
                                                      order)
            if save_dir and (episode % max(cfg.save_interval, 1) == 0
                             or episode == self.episodes - 1):
                ckpt_lib.save(save_dir, states, step=episode, key=key)
            eval_val = None
            if self.eval_envs is not None and cfg.use_eval \
                    and episode % cfg.eval_interval == 0:
                if not hasattr(self, "_eval_fn"):
                    self._eval_fn = jax.jit(self._eval_episode)
                key, k_ev = jax.random.split(key)
                eval_val = float(self._eval_fn(states, k_ev))
            if episode % cfg.log_interval == 0 or episode == self.episodes - 1:
                metrics = jax.device_get(metrics)
                total_steps = (episode + 1) * cfg.episode_length * self.N
                fps = total_steps / (time.perf_counter() - start)
                row = {"episode": episode, "steps": total_steps, "fps": fps,
                       "average_episode_rewards":
                           float(metrics["average_episode_rewards"])}
                if eval_val is not None:
                    row["eval_average_episode_rewards"] = eval_val
                for i in range(self.num_agents):
                    for k, v in metrics[f"agent{i}"].items():
                        row[f"agent{i}/{k}"] = float(v)
                history.append(row)
                if log_fn is print:
                    print(f"ep {episode} steps {total_steps} fps {fps:,.0f} "
                          f"rew {row['average_episode_rewards']:.2f}")
                elif log_fn is not None:
                    log_fn(row)
        return states, history
