"""Device-resident Hanabi fleet: N lockstep games as one vmapped pytree.

Mirrors `HanabiVecEnv`'s observation composition
(`hanabi_env.py:70-105`, itself matching the reference
`Hanabi_Env.py:305-311`): obs = canonical(cur) + agent-turn one-hot;
share = own-hand(cur) + canonical(cur) + turn (or all players' views
under use_obs_instead_of_state); finished games present zeroed rows and
zero availability; action −1 = no-op; reward = score delta broadcast.

Two APIs over the same pure engine (`jax_engine.py`, bit-exact vs the
C++/HLE engines):
  * pure — `reset_states` / `observe` / `pure_step` / `masked_reset`
    compose INSIDE jitted programs (the scan-of-rounds episode runs with
    zero host callbacks);
  * protocol — numpy `reset(mask)` / `step(actions)` matching
    HanabiVecEnv for the host seat loop and evaluation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.envs.hanabi import jax_engine as je
from onpolicy_tpu.envs.hanabi.hanabi_env import PRESETS
from onpolicy_tpu.utils import spaces as sp


class JaxHanabiFleet:
    def __init__(self, hanabi_name: str, num_agents: int, n_envs: int,
                 seed: int = 0, use_obs_instead_of_state: bool = False):
        if hanabi_name not in PRESETS:
            raise ValueError(f"unknown hanabi preset {hanabi_name!r}; "
                             f"known: {sorted(PRESETS)}")
        p = PRESETS[hanabi_name]
        self.game = je.JaxHanabiGame.make(
            colors=p["colors"], ranks=p["ranks"], players=num_agents,
            hand_size=p["hand_size"], max_info=p["max_info"],
            max_life=p["max_life"], minimal=p["minimal"])
        self.n_envs = n_envs
        self.num_agents = M = num_agents
        self.obs_instead_of_state = use_obs_instead_of_state
        self.obs_dim = self.game.obs_dim + M
        if use_obs_instead_of_state:
            self.share_dim = self.game.obs_dim * M + M
        else:
            self.share_dim = self.game.ownhand_dim + self.game.obs_dim + M
        self.n_moves = self.game.n_moves
        self.observation_space = [sp.Box((self.obs_dim,))] * M
        self.share_observation_space = [sp.Box((self.share_dim,))] * M
        self.action_space = [sp.Discrete(self.n_moves)] * M
        self._key = jax.random.PRNGKey(seed)
        self._states = None   # protocol-API state cache
        self._proto_step = jax.jit(self.pure_step)
        self._proto_observe = jax.jit(self.observe)
        self._proto_masked_reset = jax.jit(self.masked_reset)
        self._proto_reset_all = jax.jit(self.reset_states)

    # ---- pure API (compose inside jit) -------------------------------
    def reset_states(self, key: jax.Array):
        keys = jax.random.split(key, self.n_envs)
        return jax.vmap(lambda k: je.reset(self.game, k))(keys)

    def observe(self, states):
        """→ (obs [N,Do], share [N,Ds], avail [N,A], cur [N], done [N],
        score [N]) — zeroed rows for finished games."""
        game, M = self.game, self.num_agents
        cur = states.cur_player
        done = states.terminal
        enc = jax.vmap(lambda s: je.encode(game, s, s.cur_player))(states)
        avail = jax.vmap(lambda s: je.legal_mask_for(
            game, s, s.cur_player))(states)
        scr = jax.vmap(lambda s: je.score(game, s))(states)
        turn = jax.nn.one_hot(cur, M)
        obs = jnp.concatenate([enc, turn], -1)
        if self.obs_instead_of_state:
            views = [jax.vmap(lambda s: je.encode(
                game, s, jnp.asarray(p)))(states) for p in range(M)]
            share = jnp.concatenate(views + [turn], -1)
        else:
            own = jax.vmap(lambda s: je.encode_own_hand(
                game, s, s.cur_player))(states)
            share = jnp.concatenate([own, enc, turn], -1)
        alive = (~done)[:, None].astype(jnp.float32)
        return (obs * alive, share * alive, avail * alive, cur, done, scr)

    def pure_step(self, states, actions: jax.Array):
        """actions [N] int (−1 no-op) → (states', obs, share,
        rewards [N,M,1], done [N], avail [N,A], score [N])."""
        states, rew = jax.vmap(
            lambda s, a: je.step(self.game, s, a))(states,
                                                   actions.astype(jnp.int32))
        obs, share, avail, cur, done, scr = self.observe(states)
        rewards = jnp.broadcast_to(rew[:, None, None],
                                   (self.n_envs, self.num_agents, 1))
        return states, obs, share, rewards, done, avail, scr

    def masked_reset(self, states, mask: jax.Array, key: jax.Array):
        """Fresh games where mask, untouched elsewhere."""
        fresh = self.reset_states(key)
        def sel(new, old):
            m = mask.reshape((self.n_envs,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)
        return jax.tree_util.tree_map(sel, fresh, states)

    # ---- HanabiVecEnv numpy protocol (host loop + eval) --------------
    def _gather_np(self):
        obs, share, avail, cur, done, scr = [
            np.asarray(x) for x in self._proto_observe(self._states)]
        return obs, share, avail, cur, done, scr

    def reset(self, reset_choose: Optional[np.ndarray] = None):
        self._key, k = jax.random.split(self._key)
        if reset_choose is None or self._states is None:
            self._states = self._proto_reset_all(k)
        else:
            self._states = self._proto_masked_reset(
                self._states, jnp.asarray(np.asarray(reset_choose, bool)), k)
        obs, share, avail, cur, done, scr = self._gather_np()
        return obs, share, avail, cur

    def step(self, actions: np.ndarray):
        out = self._proto_step(self._states, jnp.asarray(actions))
        self._states = out[0]
        obs, share, rewards, done, avail, scr = [np.asarray(x)
                                                 for x in out[1:]]
        cur = np.asarray(self._states.cur_player)
        return obs, share, rewards, done.astype(bool), cur, avail, scr

    def close(self):
        pass
