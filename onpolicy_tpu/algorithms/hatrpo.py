"""HATRPO: Heterogeneous-Agent Trust Region Policy Optimization.

Re-derivation of `/root/reference/onpolicy/algorithms/hatrpo/
hatrpo_trainer.py` in functional JAX. Per minibatch (single epoch, like
the reference `train`, :355-375):

  * critic: one Adam step on the clipped value loss (:219-231);
  * actor: natural-gradient TRPO step —
      g     = ∇θ E[Π exp(Δlogp)·factor·adv]           (:233-242)
      Fv    = ∇²(KL)·v + 0.1·v  via forward-over-reverse hvp  (:175-184)
      dir   = conjugate_gradient(F, g), 10 iters       (:157-173)
      step  = dir / sqrt(dir·F·dir / (2·kl_threshold)) (:265-267)
      then ls_step backtracking halvings accepting the first candidate
      with KL(old‖new) < kl_threshold, improvement ratio > accept_ratio,
      and positive improvement (:277-321); on failure the old params are
      kept.

  KL forms match the reference: closed-form gaussian (sum keepdim) and
  the smoothed logit-space surrogate exp(Δ)−1−Δ for categoricals
  (`kl_approx`, :130-153).

The whole update — CG loop, hvp, line search — is one jitted program
(fori_loop over CG iters and line-search candidates) instead of the
reference's host-side loop with parameter copies.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.happo import HAPPO
from onpolicy_tpu.ops import losses
from onpolicy_tpu.ops import valuenorm as vn
from onpolicy_tpu.utils import spaces as sp

CG_ITERS = 10
DAMPING = 0.1


class HATRPO(HAPPO):
    """Trainer: MAPPO/HAPPO interface, TRPO actor update."""

    def _policy_outputs(self, actor_params, mb, seq_mode, active):
        if seq_mode:
            return self.actor.evaluate_trpo_seq(
                actor_params, mb["obs"], mb["rnn_states"], mb["actions"],
                mb["masks"], mb.get("available_actions"), active)
        return self.actor.evaluate_trpo(
            actor_params, mb["obs"], mb["rnn_states"], mb["actions"],
            mb["masks"], mb.get("available_actions"), active)

    def _kl(self, new_out, old_out):
        """KL(old ‖ new) per row, summed keepdim (`kl_divergence`)."""
        _, _, mu, std, logits = new_out
        _, _, mu_old, std_old, logits_old = old_out
        if mu is None:  # categorical: smoothed logit-space surrogate
            delta = logits - jax.lax.stop_gradient(logits_old)
            kl = jnp.exp(delta) - 1.0 - delta
        else:
            mu_old = jax.lax.stop_gradient(mu_old)
            std_old = jax.lax.stop_gradient(std_old)
            kl = (jnp.log(std) - jnp.log(std_old)
                  + (jnp.square(std_old) + jnp.square(mu_old - mu))
                  / (2.0 * jnp.square(std)) - 0.5)
        return jnp.sum(kl, axis=-1, keepdims=True)

    def _trpo_update(self, state, mb) -> Tuple[object, dict]:
        cfg = self.cfg
        seq_mode = cfg.is_recurrent
        active = mb["active_masks"] if cfg.use_policy_active_masks else None
        am_flat = mb["active_masks"].reshape(-1, 1)
        factor = mb.get("factor")
        factor_flat = factor.reshape(-1, 1) if factor is not None \
            else jnp.ones_like(am_flat)
        old_logp = mb["old_action_log_probs"].reshape(
            -1, mb["old_action_log_probs"].shape[-1])
        adv = mb["advantages"].reshape(-1, 1)

        # ---- critic Adam step ---------------------------------------
        vnorm = state.vnorm
        if cfg.use_popart or cfg.use_valuenorm:
            vnorm = vn.update(vnorm, mb["returns"].reshape(-1, 1))

        def critic_loss_fn(cp):
            if seq_mode:
                values = self.critic.forward_seq(
                    cp, mb["share_obs"], mb["rnn_states_critic"], mb["masks"])
            else:
                values, _ = self.critic.forward(
                    cp, mb["share_obs"], mb["rnn_states_critic"], mb["masks"])
            return losses.value_loss(
                values, mb["value_preds"], mb["returns"], mb["active_masks"],
                vnorm, clip_param=cfg.clip_param,
                use_clipped_value_loss=cfg.use_clipped_value_loss,
                use_huber_loss=cfg.use_huber_loss,
                huber_delta=cfg.huber_delta,
                use_value_active_masks=cfg.use_value_active_masks
            ) * cfg.value_loss_coef

        v_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params)
        c_up, c_opt = self.critic_tx.update(c_grads, state.critic_opt_state,
                                            state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_up)

        # ---- actor natural-gradient step ----------------------------
        theta0, unravel = ravel_pytree(state.actor_params)

        def surrogate(theta):
            out = self._policy_outputs(unravel(theta), mb, seq_mode, active)
            logp = out[0]
            ratio = jnp.exp(jnp.sum(logp - old_logp, axis=-1, keepdims=True))
            surr = ratio * factor_flat * adv
            if cfg.use_policy_active_masks:
                return jnp.sum(surr * am_flat) / jnp.maximum(
                    jnp.sum(am_flat), 1e-8)
            return jnp.mean(surr)

        old_out = tuple(
            jax.lax.stop_gradient(x) if x is not None else None
            for x in self._policy_outputs(state.actor_params, mb, seq_mode,
                                          active))

        def kl_mean(theta):
            new_out = self._policy_outputs(unravel(theta), mb, seq_mode,
                                           active)
            return jnp.mean(self._kl(new_out, old_out))

        loss0, g = jax.value_and_grad(surrogate)(theta0)

        grad_kl = jax.grad(kl_mean)

        def fvp(v):
            _, hv = jax.jvp(grad_kl, (theta0,), (v,))
            return hv + DAMPING * v

        # conjugate gradient (openai-baselines form, fixed iters)
        def cg_body(_, carry):
            x, r, p, rdotr = carry
            Ap = fvp(p)
            alpha = rdotr / jnp.maximum(jnp.dot(p, Ap), 1e-12)
            x = x + alpha * p
            r = r - alpha * Ap
            new_rdotr = jnp.dot(r, r)
            beta = new_rdotr / jnp.maximum(rdotr, 1e-12)
            p = r + beta * p
            return x, r, p, new_rdotr

        x0 = jnp.zeros_like(g)
        step_dir, *_ = jax.lax.fori_loop(
            0, CG_ITERS, cg_body, (x0, g, g, jnp.dot(g, g)))

        shs = 0.5 * jnp.dot(step_dir, fvp(step_dir))
        step_size = 1.0 / jnp.sqrt(jnp.maximum(shs / cfg.kl_threshold, 1e-12))
        full_step = step_size * step_dir
        expected_improve0 = jnp.dot(g, full_step)

        # ---- backtracking line search (first acceptance wins) -------
        def ls_body(i, carry):
            accepted, theta_best, kl_out, improve_out, exp_out = carry
            fraction = 0.5 ** i
            cand = theta0 + fraction * full_step
            new_loss = surrogate(cand)
            improve = new_loss - loss0
            kl = kl_mean(cand)
            exp_improve = expected_improve0 * fraction
            ok = ((kl < cfg.kl_threshold)
                  & (improve / jnp.maximum(exp_improve, 1e-12)
                     > cfg.accept_ratio)
                  & (improve > 0) & (~accepted))
            theta_best = jnp.where(ok, cand, theta_best)
            kl_out = jnp.where(ok, kl, kl_out)
            improve_out = jnp.where(ok, improve, improve_out)
            exp_out = jnp.where(ok, exp_improve, exp_out)
            return accepted | ok, theta_best, kl_out, improve_out, exp_out

        accepted, theta_new, kl_f, improve_f, exp_f = jax.lax.fori_loop(
            0, cfg.ls_step, ls_body,
            (jnp.zeros((), bool), theta0, jnp.zeros(()), jnp.zeros(()),
             jnp.zeros(())))

        new_out = self._policy_outputs(unravel(theta_new), mb, seq_mode,
                                       active)
        entropy = new_out[1]
        metrics = {
            "value_loss": v_loss,
            "critic_grad_norm": losses.global_grad_norm(c_grads),
            "kl": kl_f, "loss_improve": improve_f,
            "expected_improve": exp_f,
            "dist_entropy": entropy,
            "ratio": jnp.mean(jnp.exp(jnp.sum(
                new_out[0] - old_logp, -1, keepdims=True))),
            "accepted": accepted.astype(jnp.float32),
        }
        return state.replace(
            actor_params=unravel(theta_new),
            critic_params=critic_params,
            critic_opt_state=c_opt,
            vnorm=vnorm), metrics

    def train(self, state, buf: buf_lib.RolloutBuffer, key: jax.Array,
              factor: Optional[jax.Array] = None):
        """Single pass: num_mini_batch TRPO updates (no ppo_epoch)."""
        cfg = self.cfg
        adv = losses.normalize_advantages(
            buf.advantages,
            buf.active_masks[:-1] if cfg.use_policy_active_masks else None)
        mbs = self._sample_minibatches(buf, adv, key, factor=factor)
        state, metrics = jax.lax.scan(
            lambda st, mb: self._trpo_update(st, mb), state, mbs)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)
