import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onpolicy_tpu.ops import distributions as D


class TestCategorical:
    def test_log_prob_matches_log_softmax(self):
        logits = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        d = D.Categorical.create(logits)
        a = jnp.array([[2], [0]])
        lp = d.log_prob(a)
        expect = jax.nn.log_softmax(logits)[jnp.arange(2), a[:, 0]]
        np.testing.assert_allclose(lp[:, 0], expect, rtol=1e-6)
        assert lp.shape == (2, 1)

    def test_masking_excludes_actions(self):
        logits = jnp.zeros((1, 4))
        avail = jnp.array([[1, 0, 1, 0]], jnp.float32)
        d = D.Categorical.create(logits, avail)
        samples = jax.vmap(lambda k: d.sample(k))(
            jax.random.split(jax.random.PRNGKey(0), 200))
        assert set(np.unique(samples)) <= {0, 2}
        # masked probs ~ 0
        np.testing.assert_allclose(np.asarray(d.probs)[0, [1, 3]], 0.0, atol=1e-6)

    def test_entropy_uniform(self):
        d = D.Categorical.create(jnp.zeros((1, 4)))
        np.testing.assert_allclose(d.entropy()[0], np.log(4.0), rtol=1e-6)

    def test_mode(self):
        d = D.Categorical.create(jnp.array([[0.1, 5.0, 0.2]]))
        assert d.mode()[0, 0] == 1

    def test_masked_entropy_over_available(self):
        avail = jnp.array([[1, 1, 0, 0]], jnp.float32)
        d = D.Categorical.create(jnp.zeros((1, 4)), avail)
        np.testing.assert_allclose(d.entropy()[0], np.log(2.0), rtol=1e-5)


class TestDiagGaussian:
    def test_log_prob_matches_scipy_form(self):
        mean = jnp.array([[0.5, -1.0]])
        log_std = jnp.array([[0.0, 0.3]])
        d = D.DiagGaussian(mean, log_std)
        x = jnp.array([[0.0, 0.0]])
        var = np.exp(2 * np.asarray(log_std))
        expect = np.sum(
            -0.5 * ((np.asarray(x) - np.asarray(mean)) ** 2 / var
                    + np.log(2 * np.pi) + 2 * np.asarray(log_std)), -1)
        np.testing.assert_allclose(d.log_prob(x)[:, 0], expect, rtol=1e-4)

    def test_entropy(self):
        d = D.DiagGaussian(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
        expect = 3 * 0.5 * (1 + np.log(2 * np.pi))
        np.testing.assert_allclose(d.entropy()[0], expect, rtol=1e-4)

    def test_kl_self_zero(self):
        d = D.DiagGaussian(jnp.ones((2, 3)), jnp.zeros((2, 3)) - 0.5)
        np.testing.assert_allclose(d.kl(d), 0.0, atol=1e-6)

    def test_sample_moments(self):
        d = D.DiagGaussian(jnp.full((1, 1), 2.0), jnp.full((1, 1), np.log(0.5)))
        ks = jax.random.split(jax.random.PRNGKey(1), 4000)
        s = np.asarray(jax.vmap(d.sample)(ks))
        assert abs(s.mean() - 2.0) < 0.05
        assert abs(s.std() - 0.5) < 0.05


class TestBernoulli:
    def test_log_prob(self):
        d = D.Bernoulli(jnp.array([[0.0, 2.0]]))
        a = jnp.array([[1.0, 0.0]])
        p = jax.nn.sigmoid(jnp.array([0.0, 2.0]))
        expect = np.log(p[0]) + np.log(1 - p[1])
        np.testing.assert_allclose(d.log_prob(a)[0, 0], expect, rtol=1e-5)

    def test_entropy_half(self):
        d = D.Bernoulli(jnp.zeros((1, 1)))
        np.testing.assert_allclose(d.entropy()[0], np.log(2.0), rtol=1e-6)
