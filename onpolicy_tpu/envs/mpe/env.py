"""Pure-JAX MPE environment + lockstep vectorization.

Replaces the reference's `MultiAgentEnv` wrapper + `SubprocVecEnv`
subprocess pool (`/root/reference/onpolicy/envs/mpe/environment.py`,
`envs/env_wrappers.py:235-297`) with pure functions over pytree state:
the vectorized env steps thousands of instances in lockstep on device
inside the training `lax.scan` — no process boundary, no host↔device
ping-pong.

Semantics preserved:
  * discrete action decoding via one-hot difference: u=[a₁−a₂, a₃−a₄]
    scaled by sensitivity (accel or 5.0) (`environment.py:221-236`);
  * comm one-hot c[comm_idx]=1 for non-silent agents;
  * cooperative reward = sum over agents broadcast to all
    (`environment.py:138-141`);
  * episode ends when step count reaches world_length
    (`environment.py:177-183`); auto-reset returns the fresh obs with the
    terminal step's rewards/dones (`env_wrappers.py:146-153`).

Actions arrive in storage format — integer indices [M, n_heads] (not the
reference's one-hot, which was a runner artifact).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.envs.mpe import scenarios as scenario_registry
from onpolicy_tpu.envs.mpe.world import physics_step
from onpolicy_tpu.utils import spaces as sp


class MPEEnv:
    """One env instance as pure reset/step functions (vmap over envs)."""

    def __init__(self, scenario_name: str, num_agents: int,
                 num_landmarks: int, episode_length: int,
                 num_good_agents: int = 1, num_adversaries: int = 3):
        from types import SimpleNamespace
        self.scenario = scenario_registry.load(scenario_name)
        args = SimpleNamespace(
            num_agents=num_agents, num_landmarks=num_landmarks,
            episode_length=episode_length, num_good_agents=num_good_agents,
            num_adversaries=num_adversaries)
        self.spec = self.scenario.make_spec(args)
        self.scenario_name = scenario_name
        spec = self.spec
        M = spec.n_agents

        # --- action spaces (environment.py:55-98, discrete default) ---
        self.action_space = []
        self._move_col = np.full(M, -1)
        self._comm_col = np.full(M, -1)
        for i in range(M):
            heads = []
            if spec.agent_movable[i]:
                self._move_col[i] = len(heads)
                heads.append(5)
            if not spec.agent_silent[i] and spec.dim_c > 0:
                self._comm_col[i] = len(heads)
                heads.append(spec.dim_c)
            if len(heads) == 1:
                self.action_space.append(sp.Discrete(heads[0]))
            else:
                self.action_space.append(sp.MultiDiscrete(tuple(heads)))
        self.n_action_heads = max(
            sp.action_storage_dim(a) for a in self.action_space)

        # --- observation spaces from a dummy reset ---
        st = self.scenario.reset(spec, jax.random.PRNGKey(0))
        obs = self.scenario.observation(spec, st)
        self.observation_space = [sp.Box((int(o.shape[0]),)) for o in obs]
        share_dim = sum(o.shape[0] for o in obs)
        self.share_observation_space = [sp.Box((share_dim,))] * M

        self.num_agents = M
        self._sensitivity = np.array(
            [a if a is not None else 5.0 for a in spec.agent_accel],
            np.float64)

    # -- pure functions ----------------------------------------------
    def reset(self, key: jax.Array):
        state = self.scenario.reset(self.spec, key)
        return state, self.scenario.observation(self.spec, state)

    def _decode_actions(self, actions: jax.Array):
        """actions [M, n_heads] int/float indices → (u [M,2], c [M,dim_c])."""
        spec = self.spec
        M = spec.n_agents
        a = actions.astype(jnp.int32)
        movable = np.array(spec.agent_movable)
        mcol = np.maximum(self._move_col, 0)
        mi = a[np.arange(M), mcol]
        ux = (mi == 1).astype(jnp.float32) - (mi == 2).astype(jnp.float32)
        uy = (mi == 3).astype(jnp.float32) - (mi == 4).astype(jnp.float32)
        u = jnp.stack([ux, uy], -1) * self._sensitivity[:, None]
        u = jnp.where(movable[:, None], u, 0.0)

        if spec.dim_c > 0:
            has_comm = self._comm_col >= 0
            ccol = np.maximum(self._comm_col, 0)
            ci = a[np.arange(M), ccol]
            c = jax.nn.one_hot(ci, spec.dim_c)  # canonical float (f64 in golden x64 mode)
            c = jnp.where(has_comm[:, None], c, 0.0)
        else:
            c = jnp.zeros((M, 1))
        return u, c

    def step(self, state, actions: jax.Array, key: jax.Array):
        """→ (state', obs tuple, rewards [M,1], done scalar bool)."""
        u, c = self._decode_actions(actions)
        state = physics_step(self.spec, state, u, c, key)
        obs = self.scenario.observation(self.spec, state)
        rew = self.scenario.reward(self.spec, state)          # [M]
        if getattr(self.scenario, "shared_reward", False):
            rew = jnp.full_like(rew, jnp.sum(rew))
        done = state.t >= self.spec.world_length
        return state, obs, rew[:, None], done


class MPEVecEnv:
    """N lockstep instances with auto-reset — ShareVecEnv equivalent,
    fully on device and jit-friendly (call inside your rollout scan)."""

    def __init__(self, env: MPEEnv, n_envs: int):
        self.env = env
        self.n_envs = n_envs
        self.num_agents = env.num_agents
        self.observation_space = env.observation_space
        self.share_observation_space = env.share_observation_space
        self.action_space = env.action_space

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.n_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(self, states, actions: jax.Array, key: jax.Array):
        """actions [N, M, heads] → (states', obs, rewards [N,M,1],
        dones [N, M]). Auto-resets finished envs (fresh obs, terminal
        rewards/dones — `env_wrappers.py:146-153`)."""
        k_step, k_reset = jax.random.split(key)
        step_keys = jax.random.split(k_step, self.n_envs)
        states2, obs, rew, done = jax.vmap(self.env.step)(states, actions,
                                                          step_keys)
        reset_keys = jax.random.split(k_reset, self.n_envs)
        reset_states, reset_obs = jax.vmap(self.env.reset)(reset_keys)

        def pick(new, old):
            d = done.reshape((self.n_envs,) + (1,) * (old.ndim - 1))
            return jnp.where(d, new, old)

        states3 = jax.tree_util.tree_map(pick, reset_states, states2)
        obs3 = jax.tree_util.tree_map(pick, reset_obs, obs)
        dones = jnp.broadcast_to(done[:, None], (self.n_envs, self.num_agents))
        return states3, obs3, rew, dones


def make_vec_env(cfg, n_envs: int = None) -> MPEVecEnv:
    env = MPEEnv(cfg.scenario_name, cfg.num_agents, cfg.num_landmarks,
                 cfg.episode_length, getattr(cfg, "num_good_agents", 1),
                 getattr(cfg, "num_adversaries", 3))
    return MPEVecEnv(env, n_envs or cfg.n_rollout_threads)
