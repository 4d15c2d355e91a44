"""MAT: Multi-Agent Transformer policy + trainer.

Parity with `/root/reference/onpolicy/algorithms/mat/
{algorithm/transformer_policy.py, mat_trainer.py}`: one transformer, one
Adam optimizer (lr, eps=opti_eps, weight_decay), joint loss
policy − entropy·coef + value·coef, always the transformer sampler
(agent axis kept intact), ValueNorm for targets. Exposes the same
get_actions/get_values/act/train interface as MAPPO so the shared
runner dispatches on algorithm name (like `base_runner.py:66-71`) —
rnn-state arguments pass through untouched
(`transformer_policy.py:117-119`).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.models import transformer as tfm
from onpolicy_tpu.ops import losses, schedules, valuenorm as vn
from onpolicy_tpu.utils import spaces as sp


@struct.dataclass
class MATTrainState:
    params: Any
    opt_state: Any
    vnorm: Optional[vn.ValueNormState]


class MAT:
    @property
    def critic_reads(self):
        return "share_obs" if self.cfg.encode_state else "obs"

    def __init__(self, cfg, obs_space, share_obs_space, act_space,
                 total_updates: int = 1, num_agents: int = None):
        self.cfg = cfg
        self.num_agents = num_agents if num_agents is not None \
            else cfg.num_agents
        self.obs_dim = sp.obs_shape(obs_space)[0]
        if isinstance(act_space, sp.Discrete):
            action_dim, action_type = act_space.n, "Discrete"
        elif isinstance(act_space, sp.Box):
            action_dim, action_type = act_space.shape[0], "Box"
        else:
            raise TypeError(f"MAT supports Discrete/Box, got {act_space}")
        self.act_space = act_space
        self.share_obs_dim = sp.obs_shape(share_obs_space)[0]
        self.mcfg = tfm.MATConfig(
            self.num_agents, action_dim, cfg.n_block, cfg.n_embd, cfg.n_head,
            action_type, cfg.dec_actor, cfg.share_actor, cfg.encode_state)

        def lr():
            if cfg.use_linear_lr_decay:
                per_episode = cfg.ppo_epoch * cfg.num_mini_batch
                return lambda c: cfg.lr * (
                    1.0 - (c // per_episode) / float(max(total_updates, 1)))
            return cfg.lr
        self.tx = schedules.make_optimizer(
            lr(), cfg.opti_eps, cfg.weight_decay, cfg.max_grad_norm,
            cfg.use_max_grad_norm)

    def init_state(self, key: jax.Array) -> MATTrainState:
        enc_dim = self.share_obs_dim if self.cfg.encode_state \
            else self.obs_dim
        params = tfm.mat_init(
            key, self.obs_dim, self.mcfg.action_dim, self.num_agents,
            self.cfg.n_block, self.cfg.n_embd, self.mcfg.action_type,
            self.cfg.dec_actor, self.cfg.share_actor, encoder_dim=enc_dim)
        vnorm = vn.create(1) if self.cfg.use_valuenorm else None
        return MATTrainState(params=params, opt_state=self.tx.init(params),
                             vnorm=vnorm)

    # ---- rollout API (flat [B·M, ...] like the reference policy) -----
    def _fold(self, x):
        B = x.shape[0] // self.num_agents
        return x.reshape(B, self.num_agents, *x.shape[1:])

    def _flat(self, x):
        return x.reshape(-1, *x.shape[2:])

    def get_actions(self, state, share_obs, obs, rnn_actor, rnn_critic,
                    masks, key, available_actions=None, deterministic=False):
        obs3 = self._fold(obs)
        enc_in = self._fold(share_obs) if self.cfg.encode_state else None
        avail3 = self._fold(available_actions) \
            if available_actions is not None else None
        actions, logp, values = tfm.autoregressive_act(
            self.mcfg, state.params, obs3, key, avail3, deterministic,
            enc_in=enc_in)
        return (self._flat(values), self._flat(actions), self._flat(logp),
                rnn_actor, rnn_critic)

    def get_values(self, state, obs, rnn_critic, masks):
        # the critic is the encoder value head over OBS (the reference
        # zeroes and ignores cent_obs/state, ma_transformer.py:237-239,
        # 301-309); the runner passes obs here via `critic_reads`
        return self._flat(tfm.get_values(self.mcfg, state.params,
                                         self._fold(obs)))

    def act(self, state, obs, rnn_actor, masks, key=None,
            available_actions=None, deterministic=True):
        obs3 = self._fold(obs)
        avail3 = self._fold(available_actions) \
            if available_actions is not None else None
        actions, _, _ = tfm.autoregressive_act(
            self.mcfg, state.params, obs3,
            key if key is not None else jax.random.PRNGKey(0),
            avail3, deterministic)
        return self._flat(actions), rnn_actor

    # ---- training -----------------------------------------------------
    def _update(self, state: MATTrainState, mb: dict):
        cfg = self.cfg
        vnorm = state.vnorm
        if cfg.use_valuenorm:
            vnorm = vn.update(vnorm, mb["returns"].reshape(-1, 1))
        avail = mb.get("available_actions")

        enc_in = mb["share_obs"] if self.cfg.encode_state else None

        def loss_fn(params):
            logp, values, entropy = tfm.parallel_act(
                self.mcfg, params, mb["obs"], mb["actions"], avail,
                enc_in=enc_in)
            am = mb["active_masks"]
            if cfg.use_policy_active_masks:
                ent = jnp.sum(entropy * am) / jnp.maximum(jnp.sum(am), 1e-8)
            else:
                ent = jnp.mean(entropy)
            pol_loss, ratio = losses.ppo_policy_loss(
                logp, mb["old_action_log_probs"], mb["advantages"], am,
                clip_param=cfg.clip_param,
                use_policy_active_masks=cfg.use_policy_active_masks)
            v_loss = losses.value_loss(
                values, mb["value_preds"], mb["returns"], am, vnorm,
                clip_param=cfg.clip_param,
                use_clipped_value_loss=cfg.use_clipped_value_loss,
                use_huber_loss=cfg.use_huber_loss,
                huber_delta=cfg.huber_delta,
                use_value_active_masks=cfg.use_value_active_masks)
            total = (pol_loss - ent * cfg.entropy_coef
                     + v_loss * cfg.value_loss_coef)
            return total, {"policy_loss": pol_loss, "value_loss": v_loss,
                           "dist_entropy": ent, "ratio": ratio}

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        aux["grad_norm"] = losses.global_grad_norm(grads)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, vnorm=vnorm), aux

    def train(self, state: MATTrainState, buf: buf_lib.RolloutBuffer,
              key: jax.Array):
        cfg = self.cfg
        adv = losses.normalize_advantages(
            buf.advantages,
            buf.active_masks[:-1] if cfg.use_policy_active_masks else None)

        if cfg.num_mini_batch == 1:
            # permutation-free sampler output is epoch-invariant — build
            # once outside the epoch scan (same hoist as MAPPO.train)
            mbs = buf_lib.transformer_minibatches(buf, adv, key,
                                                  cfg.num_mini_batch)
            epoch_fn = lambda st, ekey: jax.lax.scan(self._update, st, mbs)
        else:
            def epoch_fn(st, ekey):
                mbs = buf_lib.transformer_minibatches(buf, adv, ekey,
                                                      cfg.num_mini_batch)
                return jax.lax.scan(self._update, st, mbs)

        keys = jax.random.split(key, cfg.ppo_epoch)
        state, metrics = jax.lax.scan(epoch_fn, state, keys)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)
