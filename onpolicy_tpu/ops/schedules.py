"""Learning-rate schedules.

Parity: `update_linear_schedule` (`/root/reference/onpolicy/utils/util.py:
15-19`) — lr decays linearly from `initial_lr` to 0 over the run:
    lr(e) = initial_lr · (1 − e/E)
As an optax schedule the decay folds into the jitted update (the reference
mutates optimizer lr per episode on host).
"""
from __future__ import annotations

import optax


def linear_decay(initial_lr: float, total_updates: int) -> optax.Schedule:
    def schedule(count):
        frac = count / float(max(total_updates, 1))
        return initial_lr * (1.0 - frac)
    return schedule


def make_optimizer(lr, eps: float, weight_decay: float, max_grad_norm,
                   use_max_grad_norm: bool = True) -> optax.GradientTransformation:
    """Adam(eps=opti_eps, weight_decay) with global-norm clipping, matching
    the reference's `nn.utils.clip_grad_norm_` + Adam pairing
    (`rMAPPOPolicy.py:31-37`, `r_mappo.py:143-167`)."""
    steps = []
    if use_max_grad_norm:
        steps.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay:
        steps.append(optax.adamw(lr, eps=eps, weight_decay=weight_decay))
    else:
        steps.append(optax.adam(lr, eps=eps))
    return optax.chain(*steps)
