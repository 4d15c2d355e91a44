"""GAE parity tests: the reverse-scan must reproduce the reference's
reversed Python loop (`shared_buffer.py:179-262`) on random inputs for the
full variant grid."""
import numpy as np
import jax.numpy as jnp
import pytest

from onpolicy_tpu.ops import gae, valuenorm as vn


def ref_compute_returns(rewards, value_preds, masks, bad_masks, gamma, lam,
                        use_gae, use_proper, denorm=None):
    """Direct numpy transliteration of the reference formulas."""
    T = rewards.shape[0]
    returns = np.zeros_like(value_preds)
    dn = denorm if denorm is not None else (lambda x: x)
    if use_gae:
        g = np.zeros_like(rewards[0])
        for t in reversed(range(T)):
            delta = rewards[t] + gamma * dn(value_preds[t + 1]) * masks[t + 1] \
                - dn(value_preds[t])
            g = delta + gamma * lam * masks[t + 1] * g
            if use_proper:
                g = g * bad_masks[t + 1]
            returns[t] = g + dn(value_preds[t])
    else:
        returns[-1] = dn(value_preds[-1])
        for t in reversed(range(T)):
            ret = returns[t + 1] * gamma * masks[t + 1] + rewards[t]
            if use_proper:
                ret = ret * bad_masks[t + 1] + (1 - bad_masks[t + 1]) * dn(value_preds[t])
            returns[t] = ret
    return returns[:-1]


def _random_inputs(seed=0, T=12, B=5):
    rng = np.random.default_rng(seed)
    rewards = rng.normal(size=(T, B, 1)).astype(np.float32)
    values = rng.normal(size=(T + 1, B, 1)).astype(np.float32)
    masks = (rng.random((T + 1, B, 1)) > 0.2).astype(np.float32)
    bad = np.where(masks == 0, (rng.random((T + 1, B, 1)) > 0.5), 1.0).astype(np.float32)
    return rewards, values, masks, bad


@pytest.mark.parametrize("use_gae", [True, False])
@pytest.mark.parametrize("use_proper", [True, False])
def test_matches_reference_loop(use_gae, use_proper):
    rewards, values, masks, bad = _random_inputs()
    got, adv = gae.compute_returns(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks),
        jnp.asarray(bad), None, gamma=0.99, gae_lambda=0.95,
        use_gae=use_gae, use_proper_time_limits=use_proper)
    want = ref_compute_returns(rewards, values.copy(), masks, bad,
                               0.99, 0.95, use_gae, use_proper)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), want - values[:-1],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_proper", [True, False])
def test_matches_reference_with_normalizer(use_proper):
    rewards, values, masks, bad = _random_inputs(seed=3)
    state = vn.create(1)
    state = vn.update(state, jnp.asarray(rewards.reshape(-1, 1)))
    mean, var = vn.mean_var(state)
    mean, std = np.asarray(mean), np.sqrt(np.asarray(var))
    denorm = lambda x: x * std + mean

    got, _ = gae.compute_returns(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks),
        jnp.asarray(bad), state, gamma=0.99, gae_lambda=0.95,
        use_gae=True, use_proper_time_limits=use_proper)
    want = ref_compute_returns(rewards, values.copy(), masks, bad,
                               0.99, 0.95, True, use_proper, denorm=denorm)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_simple_hand_case():
    # 2 steps, no masking: standard GAE by hand
    rewards = jnp.array([[[1.0]], [[2.0]]])
    values = jnp.array([[[0.5]], [[0.6]], [[0.7]]])
    masks = jnp.ones((3, 1, 1))
    g, lam = 0.9, 0.8
    d1 = 2.0 + g * 0.7 - 0.6
    d0 = 1.0 + g * 0.6 - 0.5
    gae1 = d1
    gae0 = d0 + g * lam * gae1
    ret, adv = gae.compute_returns(rewards, values, masks, None, None,
                                   gamma=g, gae_lambda=lam)
    np.testing.assert_allclose(np.asarray(ret)[:, 0, 0],
                               [gae0 + 0.5, gae1 + 0.6], rtol=1e-6)
