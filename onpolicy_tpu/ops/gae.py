"""Return / advantage computation as a single reverse `lax.scan`.

Behavioral parity with the reference's `compute_returns`
(`/root/reference/onpolicy/utils/shared_buffer.py:179-262`), covering the
full 2×2×2 variant grid:

  use_gae × use_proper_time_limits × (normalized values or raw)

plus the MAT branch that additionally materializes per-step advantages.
The reference runs a reversed Python loop over T on host numpy; here the
whole recurrence compiles to one XLA fused scan on device.

Shapes: time-major `[T(+1), ...batch...]`; masks/bad_masks carry a
trailing singleton dim and gate the recurrence exactly as the reference:
  delta_t = r_t + γ·V̂_{t+1}·m_{t+1} − V̂_t
  gae_t   = delta_t + γλ·m_{t+1}·gae_{t+1}          (then ·bad_{t+1} if proper limits)
  ret_t   = gae_t + V̂_t
where V̂ is the denormalized value when a normalizer is in use.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.ops import valuenorm as vn


def compute_returns(
    rewards: jax.Array,        # [T, ...]
    value_preds: jax.Array,    # [T+1, ...]  (slot T = bootstrap next_value)
    masks: jax.Array,          # [T+1, ...]
    bad_masks: Optional[jax.Array],  # [T+1, ...] or None
    norm_state: Optional[vn.ValueNormState],
    *,
    gamma: float,
    gae_lambda: float,
    use_gae: bool = True,
    use_proper_time_limits: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (returns[T, ...], advantages[T, ...]).

    advantages = returns − V̂ (the MAT per-step `advantages` array is the
    same quantity; for non-GAE mode it is returns − V̂ as the trainers
    compute it, `r_mappo.py:179-183`).
    """
    values = vn.denormalize(norm_state, value_preds) if norm_state is not None \
        else value_preds

    v_t = values[:-1]          # [T, ...]
    v_tp1 = values[1:]         # [T, ...]
    m_tp1 = masks[1:]          # [T, ...]

    if use_gae:
        delta = rewards + gamma * v_tp1 * m_tp1 - v_t

        if use_proper_time_limits:
            assert bad_masks is not None
            b_tp1 = bad_masks[1:]

            def body(gae, x):
                d, m, b = x
                gae = (d + gamma * gae_lambda * m * gae) * b
                return gae, gae
        else:
            def body(gae, x):
                d, m = x
                gae = d + gamma * gae_lambda * m * gae
                return gae, gae

        xs = (delta, m_tp1, bad_masks[1:]) if use_proper_time_limits \
            else (delta, m_tp1)
        init = jnp.zeros_like(delta[0])
        _, gae_seq = jax.lax.scan(body, init, xs, reverse=True)
        returns = gae_seq + v_t
        advantages = gae_seq
    else:
        if use_proper_time_limits:
            assert bad_masks is not None

            def body(ret, x):
                r, m, b, v = x
                ret = (ret * gamma * m + r) * b + (1.0 - b) * v
                return ret, ret

            xs = (rewards, m_tp1, bad_masks[1:], v_t)
        else:
            def body(ret, x):
                r, m = x
                ret = ret * gamma * m + r
                return ret, ret

            xs = (rewards, m_tp1)
        # Seed with the denormalized bootstrap. (The reference's plain
        # discounted branch seeds with the raw — possibly normalized —
        # next_value, shared_buffer.py:260, mixing normalized bootstrap
        # with raw rewards; a bug we deliberately fix. Identical when no
        # normalizer is in use, which is the only configuration the
        # reference ships for this branch.)
        init = values[-1]
        _, returns = jax.lax.scan(body, init, xs, reverse=True)
        advantages = returns - v_t

    return returns, advantages
