"""MAPPO / IPPO / rMAPPO: policy + trainer as one jit-compiled program.

Re-derivation of the reference pair
(`/root/reference/onpolicy/algorithms/r_mappo/algorithm/rMAPPOPolicy.py`,
`/root/reference/onpolicy/algorithms/r_mappo/r_mappo.py`) in functional
form. The reference runs `ppo_epoch × num_mini_batch` host-side update
iterations, each a separate GPU round-trip; here `train()` is a single
XLA program: advantage normalization → nested `lax.scan` over epochs and
minibatches, with actor and critic updated by separate Adam optimizers
(lr / critic_lr, eps=opti_eps) under global-norm clipping.

IPPO is this same trainer with a decentralized critic input
(use_centralized_V=False — flag canonicalization in config); rMAPPO adds
the recurrent nets and the chunked-BPTT sampler.

Value-normalizer threading (the PopArt+psum hazard from SURVEY §7.3):
`vnorm` is updated on the raw return batch BEFORE the gradient step
(reference order: `cal_value_loss` updates then normalizes,
r_mappo.py:64-67). With PopArt the critic head weights are rescaled at
the same point. Under a data-parallel mesh the batch moments are global
reductions, so every replica sees identical stats.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.models import actor_critic, popart
from onpolicy_tpu.ops import losses, schedules, valuenorm as vn
from onpolicy_tpu.utils import spaces as sp


@struct.dataclass
class TrainState:
    actor_params: Any
    critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    vnorm: Optional[vn.ValueNormState]


class MAPPO:
    """Shared-policy MAPPO. Static metadata lives on `self`; all state
    threads through `TrainState` pytrees."""

    # HAPPO overrides: joint per-head ratio + stats-only "popart"
    prod_ratio_heads = False
    popart_rescales_head = True
    critic_reads = "share_obs"   # MAT's encoder-critic reads obs instead

    def __init__(self, cfg, obs_space, share_obs_space, act_space,
                 total_updates: int = 1):
        self.cfg = cfg
        self.act_space = act_space
        self.actor = actor_critic.Actor(cfg, obs_space, act_space)
        self.critic = actor_critic.Critic(cfg, share_obs_space)

        def lr_for(base_lr):
            if cfg.use_linear_lr_decay:
                per_episode = cfg.ppo_epoch * cfg.num_mini_batch
                return lambda count: base_lr * (
                    1.0 - (count // per_episode) / float(max(total_updates, 1)))
            return base_lr

        self.actor_tx = schedules.make_optimizer(
            lr_for(cfg.lr), cfg.opti_eps, cfg.weight_decay,
            cfg.max_grad_norm, cfg.use_max_grad_norm)
        self.critic_tx = schedules.make_optimizer(
            lr_for(cfg.critic_lr), cfg.opti_eps, cfg.weight_decay,
            cfg.max_grad_norm, cfg.use_max_grad_norm)

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> TrainState:
        ka, kc = jax.random.split(key)
        actor_params = self.actor.init(ka)
        critic_params = self.critic.init(kc)
        vnorm = vn.create(1) if (self.cfg.use_valuenorm or self.cfg.use_popart) \
            else None
        return TrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt_state=self.actor_tx.init(actor_params),
            critic_opt_state=self.critic_tx.init(critic_params),
            vnorm=vnorm,
        )

    # ---- rollout-time API (flat [B, ...] batches) --------------------
    def get_actions(self, state: TrainState, share_obs, obs, rnn_actor,
                    rnn_critic, masks, key, available_actions=None,
                    deterministic=False):
        actions, logp, rnn_actor = self.actor.forward(
            state.actor_params, obs, rnn_actor, masks, key,
            available_actions, deterministic)
        values, rnn_critic = self.critic.forward(
            state.critic_params, share_obs, rnn_critic, masks)
        return values, actions, logp, rnn_actor, rnn_critic

    def get_values(self, state: TrainState, share_obs, rnn_critic, masks):
        values, _ = self.critic.forward(state.critic_params, share_obs,
                                        rnn_critic, masks)
        return values

    def act(self, state: TrainState, obs, rnn_actor, masks,
            key=None, available_actions=None, deterministic=True):
        actions, _, rnn_actor = self.actor.forward(
            state.actor_params, obs, rnn_actor, masks,
            key if key is not None else jax.random.PRNGKey(0),
            available_actions, deterministic)
        return actions, rnn_actor

    # ---- training ----------------------------------------------------
    def _sample_minibatches(self, buf, adv, key, factor=None):
        cfg = self.cfg
        if cfg.use_recurrent_policy:
            return buf_lib.recurrent_minibatches(
                buf, adv, key, cfg.num_mini_batch, cfg.data_chunk_length,
                factor=factor)
        if cfg.use_naive_recurrent_policy:
            return buf_lib.naive_recurrent_minibatches(
                buf, adv, key, cfg.num_mini_batch, factor=factor)
        return buf_lib.feed_forward_minibatches(buf, adv, key,
                                                cfg.num_mini_batch,
                                                factor=factor)

    def _update(self, state: TrainState, mb: dict) -> Tuple[TrainState, dict]:
        """One PPO minibatch update (`r_mappo.ppo_update`, :91-169)."""
        cfg = self.cfg
        seq_mode = cfg.is_recurrent   # mb is [L, B, ...] sequences

        # normalizer update on raw returns (+ PopArt head rescale) first
        vnorm = state.vnorm
        critic_params = state.critic_params
        if cfg.use_popart and self.popart_rescales_head:
            new_vout, vnorm = popart.update(critic_params["v_out"], vnorm,
                                            mb["returns"].reshape(-1, 1))
            critic_params = {**critic_params, "v_out": new_vout}
        elif cfg.use_popart or cfg.use_valuenorm:
            # HAPPO/HATRPO use the stats-only normalizer even under
            # --use_popart (popart_hatrpo.py is a ValueNorm clone)
            vnorm = vn.update(vnorm, mb["returns"].reshape(-1, 1))

        avail = mb.get("available_actions")

        def loss_fn(params):
            ap, cp = params
            if seq_mode:
                logp, entropy = self.actor.evaluate_seq(
                    ap, mb["obs"], mb["rnn_states"], mb["actions"],
                    mb["masks"], avail,
                    mb["active_masks"] if cfg.use_policy_active_masks else None)
                values = self.critic.forward_seq(
                    cp, mb["share_obs"], mb["rnn_states_critic"], mb["masks"])
            else:
                logp, entropy = self.actor.evaluate(
                    ap, mb["obs"], mb["rnn_states"], mb["actions"],
                    mb["masks"], avail,
                    mb["active_masks"] if cfg.use_policy_active_masks else None)
                if getattr(cfg, "use_critic_dedup", False):
                    # rows are [T·N, M] in order (nmb=1 sampler is
                    # permutation-free) and share_obs is agent-invariant:
                    # one critic row per env, value broadcast back —
                    # exact (config.use_critic_dedup)
                    Ma = cfg.num_agents
                    B = mb["share_obs"].shape[0]
                    pick = lambda x: x.reshape(
                        B // Ma, Ma, *x.shape[1:])[:, 0]
                    v_env, _ = self.critic.forward(
                        cp, pick(mb["share_obs"]),
                        pick(mb["rnn_states_critic"]), pick(mb["masks"]))
                    values = jnp.broadcast_to(
                        v_env[:, None], (B // Ma, Ma, 1)).reshape(B, 1)
                else:
                    values, _ = self.critic.forward(
                        cp, mb["share_obs"], mb["rnn_states_critic"],
                        mb["masks"])

            pol_loss, ratio = losses.ppo_policy_loss(
                logp, mb["old_action_log_probs"], mb["advantages"],
                mb["active_masks"], clip_param=cfg.clip_param,
                use_policy_active_masks=cfg.use_policy_active_masks,
                factor=mb.get("factor"),
                prod_ratio_heads=self.prod_ratio_heads)
            v_loss = losses.value_loss(
                values, mb["value_preds"], mb["returns"], mb["active_masks"],
                vnorm, clip_param=cfg.clip_param,
                use_clipped_value_loss=cfg.use_clipped_value_loss,
                use_huber_loss=cfg.use_huber_loss,
                huber_delta=cfg.huber_delta,
                use_value_active_masks=cfg.use_value_active_masks)
            total = (pol_loss - entropy * cfg.entropy_coef
                     + v_loss * cfg.value_loss_coef)
            return total, {"policy_loss": pol_loss, "value_loss": v_loss,
                           "dist_entropy": entropy, "ratio": ratio}

        grads, aux = jax.grad(loss_fn, has_aux=True)(
            (state.actor_params, critic_params))
        a_grads, c_grads = grads
        aux["actor_grad_norm"] = losses.global_grad_norm(a_grads)
        aux["critic_grad_norm"] = losses.global_grad_norm(c_grads)

        a_up, a_opt = self.actor_tx.update(a_grads, state.actor_opt_state,
                                           state.actor_params)
        c_up, c_opt = self.critic_tx.update(c_grads, state.critic_opt_state,
                                            critic_params)
        return state.replace(
            actor_params=optax.apply_updates(state.actor_params, a_up),
            critic_params=optax.apply_updates(critic_params, c_up),
            actor_opt_state=a_opt, critic_opt_state=c_opt, vnorm=vnorm,
        ), aux

    def train(self, state: TrainState, buf: buf_lib.RolloutBuffer,
              key: jax.Array, factor: Optional[jax.Array] = None
              ) -> Tuple[TrainState, dict]:
        """Full PPO update over a collected buffer (`r_mappo.train`,
        :171-224): masked advantage standardization, then
        ppo_epoch × num_mini_batch updates as nested scans. `factor` is
        HAPPO's sequential-update weight [T, N, M, 1]."""
        cfg = self.cfg
        adv = losses.normalize_advantages(
            buf.advantages,
            buf.active_masks[:-1] if cfg.use_policy_active_masks else None)

        if cfg.num_mini_batch == 1:
            # the single-minibatch "sampler" is permutation-free, so its
            # output is identical every epoch — build it once and reuse,
            # instead of re-materializing the chunked buffer layout
            # (≈1 GB of transposes at bench shapes) inside every epoch
            mbs = self._sample_minibatches(buf, adv, key, factor=factor)
            epoch_fn = lambda st, ekey: jax.lax.scan(self._update, st, mbs)
        else:
            def epoch_fn(st, ekey):
                mbs = self._sample_minibatches(buf, adv, ekey, factor=factor)
                return jax.lax.scan(self._update, st, mbs)

        keys = jax.random.split(key, cfg.ppo_epoch)
        state, metrics = jax.lax.scan(epoch_fn, state, keys)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return state, metrics

    # ---- whole-batch sequence log-probs (HAPPO factor bookkeeping) ----
    def evaluate_full_logp(self, state: TrainState,
                           buf: buf_lib.RolloutBuffer) -> jax.Array:
        """Log-probs of the buffer's actions under the CURRENT actor over
        the full [T, N·M] episode (sequence-mode GRU from the t=0 hidden
        state), matching `runner/separated/base_runner.py:149-161`.
        Returns [T, N, M, Alp]."""
        T, N, M = buf.T, buf.n_rollout_threads, buf.num_agents
        fold = lambda x: x.reshape(T, N * M, *x.shape[3:])
        avail = (fold(buf.available_actions[:-1])
                 if buf.available_actions is not None else None)
        h0 = buf.rnn_states[0].reshape(N * M, *buf.rnn_states.shape[3:])
        logp, _ = self.actor.evaluate_seq(
            state.actor_params, fold(buf.obs[:-1]), h0, fold(buf.actions),
            fold(buf.masks[:-1]), avail,
            fold(buf.active_masks[:-1]))
        return logp.reshape(T, N, M, -1)
