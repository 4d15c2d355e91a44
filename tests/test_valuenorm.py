"""ValueNorm / PopArt parity vs. the reference torch modules' math."""
import numpy as np
import jax.numpy as jnp

from onpolicy_tpu.models import popart
from onpolicy_tpu.ops import valuenorm as vn
import jax


def ref_valuenorm_stats(batches, beta=0.99999, per_element=False):
    rm, rmsq, deb = 0.0, 0.0, 0.0
    for x in batches:
        w = beta ** x.shape[0] if per_element else beta
        rm = rm * w + x.mean(0) * (1 - w)
        rmsq = rmsq * w + (x ** 2).mean(0) * (1 - w)
        deb = deb * w + (1 - w)
    mean = rm / max(deb, 1e-5)
    var = max(rmsq / max(deb, 1e-5) - mean ** 2, 1e-2)
    return float(mean), float(var)


def test_update_normalize_roundtrip():
    rng = np.random.default_rng(0)
    batches = [rng.normal(5.0, 3.0, size=(64, 1)).astype(np.float32)
               for _ in range(5)]
    s = vn.create(1)
    for b in batches:
        s = vn.update(s, jnp.asarray(b))
    mean, var = vn.mean_var(s)
    rmean, rvar = ref_valuenorm_stats([b[:, 0] for b in batches])
    np.testing.assert_allclose(float(mean[0]), rmean, rtol=1e-4)
    np.testing.assert_allclose(float(var[0]), rvar, rtol=1e-3)

    x = jnp.asarray(batches[0])
    np.testing.assert_allclose(
        np.asarray(vn.denormalize(s, vn.normalize(s, x))), batches[0],
        rtol=1e-5, atol=1e-5)


def test_per_element_update_weight():
    x = np.ones((10, 1), np.float32) * 2.0
    s = vn.create(1, per_element_update=True)
    s = vn.update(s, jnp.asarray(x))
    w = vn.DEFAULT_BETA ** 10
    np.testing.assert_allclose(float(s.running_mean[0]), 2.0 * (1 - w), rtol=1e-5)


def test_popart_rescale_preserves_outputs():
    """After update(), denormalize(head(x)) must be unchanged — the PopArt
    invariant (`popart.py:48-70`)."""
    key = jax.random.PRNGKey(0)
    params, state = popart.init(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8))

    # push stats away from init first so old_std is non-trivial
    t0 = jax.random.normal(jax.random.PRNGKey(2), (256, 1)) * 3 + 7
    params, state = popart.update(params, state, t0)

    before = vn.denormalize(state, popart.apply(params, x))
    targets = jax.random.normal(jax.random.PRNGKey(3), (256, 1)) * 10 + 50
    params2, state2 = popart.update(params, state, targets)
    after = vn.denormalize(state2, popart.apply(params2, x))
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=2e-3, atol=2e-3)
