"""Loss primitives: huber/mse, PPO clipped surrogates, value loss.

Behavioral parity targets:
  * huber/mse: `/root/reference/onpolicy/utils/util.py:5-13`
  * value loss (clipping + normalizer + huber + active masks):
    `/root/reference/onpolicy/algorithms/r_mappo/r_mappo.py:52-89`
  * policy loss: `r_mappo.py:118-141`

All functions are pure; the normalizer is threaded explicitly as
(state-in → state-out), which makes them safe under jit/vmap/shard_map.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.ops import valuenorm as vn


def huber_loss(e: jax.Array, delta: float) -> jax.Array:
    a = jnp.abs(e)
    quad = 0.5 * jnp.square(jnp.minimum(a, delta))
    lin = delta * (a - jnp.minimum(a, delta))
    return quad + lin


def mse_loss(e: jax.Array) -> jax.Array:
    return 0.5 * jnp.square(e)


def masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """sum(x*mask)/sum(mask); plain mean when mask is None."""
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1e-8)


def value_loss(
    values: jax.Array,
    value_preds_old: jax.Array,
    returns: jax.Array,
    active_masks: Optional[jax.Array],
    norm_state: Optional[vn.ValueNormState],
    *,
    clip_param: float,
    use_clipped_value_loss: bool = True,
    use_huber_loss: bool = True,
    huber_delta: float = 10.0,
    use_value_active_masks: bool = True,
) -> jax.Array:
    """Clipped value loss with optional target normalization.

    Matches `r_mappo.py:52-89`: errors are computed in normalized space,
    the per-element loss is max(orig, clipped), reduced by active masks
    when enabled. NOTE: the trainer is responsible for *updating*
    `norm_state` (and rescaling the PopArt head) on the raw returns
    BEFORE calling this — here the state is only used to normalize the
    target, keeping the loss differentiable-pure. Returns loss.
    """
    value_pred_clipped = value_preds_old + jnp.clip(
        values - value_preds_old, -clip_param, clip_param)

    if norm_state is not None:
        target = vn.normalize(norm_state, returns)
    else:
        target = returns

    error_clipped = target - value_pred_clipped
    error_original = target - values

    if use_huber_loss:
        loss_clipped = huber_loss(error_clipped, huber_delta)
        loss_original = huber_loss(error_original, huber_delta)
    else:
        loss_clipped = mse_loss(error_clipped)
        loss_original = mse_loss(error_original)

    loss = jnp.maximum(loss_original, loss_clipped) if use_clipped_value_loss \
        else loss_original

    mask = active_masks if use_value_active_masks else None
    return masked_mean(loss, mask)


def ppo_policy_loss(
    log_prob_new: jax.Array,
    log_prob_old: jax.Array,
    advantages: jax.Array,
    active_masks: Optional[jax.Array],
    *,
    clip_param: float,
    use_policy_active_masks: bool = True,
    factor: Optional[jax.Array] = None,
    prod_ratio_heads: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Clipped surrogate. Returns (loss, mean_ratio).

    `factor` is HAPPO's sequential-update weight (`happo_trainer.py:137-141`);
    None for plain MAPPO. `prod_ratio_heads` selects HAPPO's joint ratio
    Π_k exp(Δlogp_k) (keepdim) over MAPPO's per-head ratios
    (`happo_trainer.py:131` vs `r_mappo.py:118-141`).
    """
    delta = log_prob_new - log_prob_old
    if prod_ratio_heads:
        ratio = jnp.exp(jnp.sum(delta, axis=-1, keepdims=True))
    else:
        ratio = jnp.exp(delta)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * advantages
    # sum over action heads first (keepdim), then batch-reduce — the
    # reference's `-torch.sum(min(surr1,surr2), dim=-1, keepdim=True)`
    # (r_mappo.py:129-141); matters for MultiDiscrete (K heads).
    surr = jnp.sum(jnp.minimum(surr1, surr2), axis=-1, keepdims=True)
    if factor is not None:
        surr = factor * surr
    mask = active_masks if use_policy_active_masks else None
    loss = -masked_mean(surr, mask)
    return loss, jnp.mean(ratio)


def normalize_advantages(
    advantages: jax.Array, active_masks: Optional[jax.Array]
) -> jax.Array:
    """Active-mask-aware advantage standardization (`r_mappo.py:179-187`).

    The reference sets inactive entries to nan and uses nanmean/nanstd; we
    compute the masked moments directly (identical result, XLA-friendly).
    """
    if active_masks is None:
        mean = jnp.mean(advantages)
        std = jnp.std(advantages)
    else:
        w = active_masks
        n = jnp.maximum(jnp.sum(w), 1e-8)
        mean = jnp.sum(advantages * w) / n
        var = jnp.sum(jnp.square(advantages - mean) * w) / n
        std = jnp.sqrt(var)
    return (advantages - mean) / (std + 1e-5)


def global_grad_norm(grads) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
