"""Recurrent actor and critic networks (R_Actor / R_Critic parity).

Re-derivation of `/root/reference/onpolicy/algorithms/r_mappo/algorithm/
r_actor_critic.py` as functional modules: `Actor`/`Critic` objects hold
only static metadata (config + spaces, both hashable) and expose pure
init/apply functions over explicit param pytrees, so they jit/vmap/pjit
freely — including vmapping `init` to build stacked per-agent parameters
for separated-policy algorithms.

Two evaluation layouts:
  * flat batch `[B, ...]` — feed-forward policies and single rollout steps;
  * sequence `[L, B, ...]` — chunked-BPTT recurrent training, replacing the
    reference's flatten-to-[L·B] + segment-scan trick with an explicit
    time axis through the mask-gated GRU scan.

The critic's PopArt statistics live in the trainer state, not here: the
head params are rescaled functionally via `models.popart.update`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import act as act_layer
from onpolicy_tpu.models import cnn, common, gru, mlp
from onpolicy_tpu.utils import spaces as sp


def _is_image(obs_shape) -> bool:
    return len(obs_shape) == 3


class Actor:
    def __init__(self, cfg, obs_space, action_space):
        self.cfg = cfg
        self.obs_space = obs_space
        self.action_space = action_space
        self.obs_shape = sp.obs_shape(obs_space)

    # -- init ---------------------------------------------------------
    def init(self, key):
        cfg = self.cfg
        kb, kr, ka = jax.random.split(key, 3)
        if _is_image(self.obs_shape):
            base = cnn.init(kb, cfg, self.obs_shape)
        else:
            base = mlp.init(kb, cfg, self.obs_shape[0])
        params = {"base": base,
                  "act": act_layer.init(ka, cfg, self.action_space,
                                        cfg.hidden_size)}
        if cfg.is_recurrent:
            params["rnn"] = gru.init(kr, cfg, cfg.hidden_size)
        return params

    def init_rnn_state(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.cfg.recurrent_N, self.cfg.hidden_size),
                         jnp.float32)

    # -- features -----------------------------------------------------
    def _features(self, params, obs):
        if _is_image(self.obs_shape):
            return cnn.apply(self.cfg, params["base"], obs)
        return mlp.apply(self.cfg, params["base"], obs)

    # -- rollout step -------------------------------------------------
    def forward(self, params, obs, rnn_states, masks, key,
                available_actions=None, deterministic=False
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """obs [B,...] → (actions, log_probs, new_rnn_states)."""
        x = self._features(params, obs)
        if self.cfg.is_recurrent:
            x, rnn_states = gru.step(self.cfg, params["rnn"], x, rnn_states, masks)
        actions, log_probs = act_layer.sample(
            self.cfg, params["act"], self.action_space, x, key,
            available_actions, deterministic)
        return actions, log_probs, rnn_states

    # -- training evaluation -----------------------------------------
    def evaluate(self, params, obs, rnn_states, action, masks,
                 available_actions=None, active_masks=None
                 ) -> Tuple[jax.Array, jax.Array]:
        """Flat-batch evaluation (feed-forward, or single-step recurrent)."""
        x = self._features(params, obs)
        if self.cfg.is_recurrent:
            x, _ = gru.step(self.cfg, params["rnn"], x, rnn_states, masks)
        return act_layer.evaluate(self.cfg, params["act"], self.action_space,
                                  x, action, available_actions, active_masks)

    def evaluate_seq(self, params, obs, rnn_states, action, masks,
                     available_actions=None, active_masks=None
                     ) -> Tuple[jax.Array, jax.Array]:
        """Sequence evaluation: obs/action/masks [L, B, ...], rnn_states
        [B, N, H] at the chunk start. Returns ([L, B, .] log-probs,
        scalar entropy)."""
        L, B = obs.shape[0], obs.shape[1]
        x = self._features(params, obs.reshape(L * B, *obs.shape[2:]))
        x = x.reshape(L, B, -1)
        if self.cfg.is_recurrent:
            x, _ = gru.sequence(self.cfg, params["rnn"], x, rnn_states, masks)
        flat = lambda a: None if a is None else a.reshape(L * B, *a.shape[2:])
        lp, ent = act_layer.evaluate(
            self.cfg, params["act"], self.action_space, x.reshape(L * B, -1),
            flat(action), flat(available_actions), flat(active_masks))
        return lp.reshape(L, B, -1), ent

    def evaluate_trpo(self, params, obs, rnn_states, action, masks,
                      available_actions=None, active_masks=None):
        x = self._features(params, obs)
        if self.cfg.is_recurrent:
            x, _ = gru.step(self.cfg, params["rnn"], x, rnn_states, masks)
        return act_layer.evaluate_trpo(self.cfg, params["act"],
                                       self.action_space, x, action,
                                       available_actions, active_masks)

    def evaluate_trpo_seq(self, params, obs, rnn_states, action, masks,
                          available_actions=None, active_masks=None):
        """Sequence-layout TRPO evaluation: obs [L, B, ...] etc. Outputs
        flattened to [L·B, ...] (the reference's trpo path works on flat
        minibatch rows)."""
        L, B = obs.shape[0], obs.shape[1]
        x = self._features(params, obs.reshape(L * B, *obs.shape[2:]))
        x = x.reshape(L, B, -1)
        if self.cfg.is_recurrent:
            x, _ = gru.sequence(self.cfg, params["rnn"], x, rnn_states, masks)
        flat = lambda a: None if a is None else a.reshape(L * B, *a.shape[2:])
        return act_layer.evaluate_trpo(
            self.cfg, params["act"], self.action_space,
            x.reshape(L * B, -1), flat(action), flat(available_actions),
            flat(active_masks))


class Critic:
    def __init__(self, cfg, cent_obs_space):
        self.cfg = cfg
        self.obs_shape = sp.obs_shape(cent_obs_space)

    def init(self, key):
        cfg = self.cfg
        kb, kr, kv = jax.random.split(key, 3)
        if _is_image(self.obs_shape):
            base = cnn.init(kb, cfg, self.obs_shape)
        else:
            base = mlp.init(kb, cfg, self.obs_shape[0])
        # v_out: plain linear (gain 1) — PopArt rescaling acts on these
        # same params when cfg.use_popart (r_actor_critic.py:149-152).
        v_out = common.linear_init(kv, cfg.hidden_size, 1, gain=1.0,
                                   use_orthogonal=cfg.use_orthogonal)
        params = {"base": base, "v_out": v_out}
        if cfg.is_recurrent:
            params["rnn"] = gru.init(kr, cfg, cfg.hidden_size)
        return params

    def init_rnn_state(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.cfg.recurrent_N, self.cfg.hidden_size),
                         jnp.float32)

    def _features(self, params, obs):
        if _is_image(self.obs_shape):
            return cnn.apply(self.cfg, params["base"], obs)
        return mlp.apply(self.cfg, params["base"], obs)

    def forward(self, params, cent_obs, rnn_states, masks
                ) -> Tuple[jax.Array, jax.Array]:
        """[B, ...] → (values [B, 1], new_rnn_states)."""
        x = self._features(params, cent_obs)
        if self.cfg.is_recurrent:
            x, rnn_states = gru.step(self.cfg, params["rnn"], x, rnn_states, masks)
        # value head in fp32 (features may be bf16 under use_bf16)
        return common.linear_apply(params["v_out"], x.astype(jnp.float32)), rnn_states

    def forward_seq(self, params, cent_obs, rnn_states, masks
                    ) -> jax.Array:
        """[L, B, ...] → values [L, B, 1]."""
        L, B = cent_obs.shape[0], cent_obs.shape[1]
        x = self._features(params, cent_obs.reshape(L * B, *cent_obs.shape[2:]))
        x = x.reshape(L, B, -1)
        if self.cfg.is_recurrent:
            x, _ = gru.sequence(self.cfg, params["rnn"], x, rnn_states, masks)
        return common.linear_apply(params["v_out"], x.astype(jnp.float32))
