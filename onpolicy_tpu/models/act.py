"""Action head (ACT layer): action-space-polymorphic output layer.

Parity with `/root/reference/onpolicy/algorithms/utils/act.py`:
  * Discrete       → masked Categorical (logit mask −1e10)
  * Box            → DiagGaussian with state-independent zero-init log_std
  * MultiBinary    → Bernoulli
  * MultiDiscrete  → one Categorical head per sub-action; actions and
                     log-probs concatenated per head (NOT summed — the PPO
                     ratio is taken per head, `act.py:78-79`)
  * Mixed (Box+Discrete) → summed log-probs, entropy weighted 1/2 + 1/0.98
Output layers initialized orthogonal with cfg.gain (0.01 default).

`evaluate` returns the batch-reduced (active-mask-weighted) entropy scalar,
like the reference's `evaluate_actions`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm
from onpolicy_tpu.ops import distributions as D
from onpolicy_tpu.utils import spaces as sp


def init(key, cfg, space, input_dim: int):
    go = dict(gain=cfg.gain, use_orthogonal=cfg.use_orthogonal)
    if isinstance(space, sp.Discrete):
        return {"out": cm.linear_init(key, input_dim, space.n, **go)}
    if isinstance(space, sp.Box):
        k1, _ = jax.random.split(key)
        d = space.shape[0]
        return {"mean": cm.linear_init(k1, input_dim, d, **go),
                "log_std": jnp.zeros((d,), jnp.float32)}
    if isinstance(space, sp.MultiBinary):
        return {"out": cm.linear_init(key, input_dim, space.n, **go)}
    if isinstance(space, sp.MultiDiscrete):
        heads = [cm.linear_init(jax.random.fold_in(key, i), input_dim, n, **go)
                 for i, n in enumerate(space.nvec)]
        return {"heads": heads}
    if isinstance(space, sp.MixedSpace):
        k1, k2 = jax.random.split(key)
        return {"mean": cm.linear_init(k1, input_dim, space.continuous_dim, **go),
                "log_std": jnp.zeros((space.continuous_dim,), jnp.float32),
                "out": cm.linear_init(k2, input_dim, space.discrete_n, **go)}
    raise TypeError(f"unsupported action space {space!r}")


def _dist(params, space, x, available_actions=None):
    if isinstance(space, sp.Discrete):
        return D.Categorical.create(cm.linear_apply(params["out"], x),
                                    available_actions)
    if isinstance(space, sp.Box):
        mean = cm.linear_apply(params["mean"], x)
        return D.DiagGaussian(mean, jnp.broadcast_to(params["log_std"], mean.shape))
    if isinstance(space, sp.MultiBinary):
        return D.Bernoulli(cm.linear_apply(params["out"], x))
    raise TypeError(space)


def sample(cfg, params, space, x: jax.Array, key: jax.Array,
           available_actions: Optional[jax.Array] = None,
           deterministic: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Returns (actions [B, A_store], log_probs [B, A_logp])."""
    x = x.astype(jnp.float32)   # heads + distribution math stay fp32
    if isinstance(space, sp.MultiDiscrete):
        actions, lps = [], []
        for i, n in enumerate(space.nvec):
            d = D.Categorical.create(cm.linear_apply(params["heads"][i], x))
            a = d.mode() if deterministic else d.sample(jax.random.fold_in(key, i))
            actions.append(a)
            lps.append(d.log_prob(a))
        return (jnp.concatenate(actions, -1).astype(jnp.float32),
                jnp.concatenate(lps, -1))
    if isinstance(space, sp.MixedSpace):
        kc, kd = jax.random.split(key)
        dc = _dist(params, sp.Box((space.continuous_dim,)), x)
        dd = D.Categorical.create(cm.linear_apply(params["out"], x),
                                  available_actions)
        ac = dc.mode() if deterministic else dc.sample(kc)
        ad = dd.mode() if deterministic else dd.sample(kd)
        lp = dc.log_prob(ac) + dd.log_prob(ad)
        return jnp.concatenate([ac, ad.astype(jnp.float32)], -1), lp
    d = _dist(params, space, x, available_actions)
    a = d.mode() if deterministic else d.sample(key)
    return a.astype(jnp.float32), d.log_prob(a)


def evaluate(cfg, params, space, x: jax.Array, action: jax.Array,
             available_actions: Optional[jax.Array] = None,
             active_masks: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """Returns (log_probs [B, A_logp], entropy scalar)."""
    x = x.astype(jnp.float32)
    if isinstance(space, sp.MultiDiscrete):
        lps, ents = [], []
        for i, n in enumerate(space.nvec):
            d = D.Categorical.create(cm.linear_apply(params["heads"][i], x))
            lps.append(d.log_prob(action[..., i:i + 1]))
            ents.append(_reduce_entropy(d.entropy(), active_masks))
        return jnp.concatenate(lps, -1), sum(ents) / len(ents)
    if isinstance(space, sp.MixedSpace):
        ac = action[..., :space.continuous_dim]
        ad = action[..., space.continuous_dim:]
        dc = _dist(params, sp.Box((space.continuous_dim,)), x)
        dd = D.Categorical.create(cm.linear_apply(params["out"], x),
                                  available_actions)
        lp = dc.log_prob(ac) + dd.log_prob(ad)
        ent = (_reduce_entropy(dc.entropy(), active_masks) / 2.0
               + _reduce_entropy(dd.entropy(), active_masks) / 0.98)
        return lp, ent
    d = _dist(params, space, x, available_actions)
    return d.log_prob(action), _reduce_entropy(d.entropy(), active_masks)


def evaluate_trpo(cfg, params, space, x, action, available_actions=None,
                  active_masks=None):
    x = x.astype(jnp.float32)
    """HATRPO variant: also returns (mu, std, all_probs)
    (`act.py:180-235`). NOTE all_probs is the (masked) LOGITS vector for
    discrete spaces — the reference appends `action_logit.logits`
    (`act.py:207,224`) and its kl_approx consumes them as-is."""
    lp, ent = evaluate(cfg, params, space, x, action, available_actions,
                       active_masks)
    if isinstance(space, sp.Discrete):
        d = _dist(params, space, x, available_actions)
        return lp, ent, None, None, d.logits
    if isinstance(space, sp.Box):
        d = _dist(params, space, x)
        return lp, ent, d.mean, d.std, None
    if isinstance(space, sp.MultiDiscrete):
        logits = jnp.concatenate(
            [D.Categorical.create(cm.linear_apply(params["heads"][i], x)).logits
             for i in range(len(space.nvec))], -1)
        return lp, ent, None, None, logits
    raise TypeError(space)


def get_probs(cfg, params, space, x, available_actions=None):
    x = x.astype(jnp.float32)
    if isinstance(space, sp.MultiDiscrete):
        return jnp.concatenate(
            [D.Categorical.create(cm.linear_apply(params["heads"][i], x)).probs
             for i in range(len(space.nvec))], -1)
    d = _dist(params, space, x, available_actions)
    return d.probs


def _reduce_entropy(ent: jax.Array, active_masks: Optional[jax.Array]) -> jax.Array:
    """ent: [B]; active_masks: [B, 1] or None → scalar."""
    if active_masks is None:
        return jnp.mean(ent)
    m = active_masks[..., 0]
    return jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1e-8)
