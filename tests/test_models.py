"""Network module tests, including GRU gate-math parity against torch.nn.GRU
(the reference's recurrent core) and mask-reset equivalence between the
reference's segment trick and our branch-free gating."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onpolicy_tpu.config import Config
from onpolicy_tpu.models import actor_critic, common, gru, mlp
from onpolicy_tpu.utils import spaces as sp

CFG = Config(hidden_size=16, layer_N=1, recurrent_N=1)


def test_orthogonal_init_is_orthogonal():
    w = common.orthogonal(jax.random.PRNGKey(0), (32, 16), gain=1.0)
    wtw = np.asarray(w.T @ w)
    np.testing.assert_allclose(wtw, np.eye(16), atol=1e-5)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    p = common.layer_norm_init(16)
    got = np.asarray(common.layer_norm_apply(p, jnp.asarray(x)))
    ln = torch.nn.LayerNorm(16)
    want = ln(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mlp_shapes_and_finite():
    params = mlp.init(jax.random.PRNGKey(0), CFG, 10)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 10))
    y = mlp.apply(CFG, params, x)
    assert y.shape == (7, 16)
    assert np.isfinite(np.asarray(y)).all()


class TestGRUTorchParity:
    def _setup(self, recurrent_N=1):
        torch = pytest.importorskip("torch")
        cfg = CFG.replace(recurrent_N=recurrent_N)
        H, IN = cfg.hidden_size, cfg.hidden_size
        params = gru.init(jax.random.PRNGKey(0), cfg, IN)
        tg = torch.nn.GRU(IN, H, num_layers=recurrent_N)
        with torch.no_grad():
            for i, layer in enumerate(params["layers"]):
                getattr(tg, f"weight_ih_l{i}").copy_(
                    torch.tensor(np.asarray(layer["w_ih"]).T))
                getattr(tg, f"weight_hh_l{i}").copy_(
                    torch.tensor(np.asarray(layer["w_hh"]).T))
                getattr(tg, f"bias_ih_l{i}").copy_(
                    torch.tensor(np.asarray(layer["b_ih"])))
                getattr(tg, f"bias_hh_l{i}").copy_(
                    torch.tensor(np.asarray(layer["b_hh"])))
        return torch, cfg, params, tg

    @pytest.mark.parametrize("recurrent_N", [1, 2])
    def test_single_step(self, recurrent_N):
        torch, cfg, params, tg = self._setup(recurrent_N)
        B, IN, H = 5, cfg.hidden_size, cfg.hidden_size
        rng = np.random.default_rng(1)
        x = rng.normal(size=(B, IN)).astype(np.float32)
        h = rng.normal(size=(B, recurrent_N, H)).astype(np.float32)
        masks = np.ones((B, 1), np.float32)

        out, h_new = gru.step(cfg, params, jnp.asarray(x), jnp.asarray(h),
                              jnp.asarray(masks))
        with torch.no_grad():
            t_out, t_h = tg(torch.tensor(x).unsqueeze(0),
                            torch.tensor(h.transpose(1, 0, 2)).contiguous())
        # our `out` is pre-LayerNorm'd; compare pre-norm hidden output
        np.testing.assert_allclose(np.asarray(h_new).transpose(1, 0, 2),
                                   t_h.numpy(), atol=1e-4)

    def test_sequence_matches_segmented_reference(self):
        """Branch-free h·mask gating == reference segment splitting."""
        torch, cfg, params, tg = self._setup()
        T, B, H = 9, 4, cfg.hidden_size
        rng = np.random.default_rng(2)
        xs = rng.normal(size=(T, B, H)).astype(np.float32)
        masks = np.ones((T, B, 1), np.float32)
        masks[3, 1] = 0.0
        masks[6] = 0.0
        h0 = rng.normal(size=(B, 1, H)).astype(np.float32)

        outs, h_fin = gru.sequence(cfg, params, jnp.asarray(xs),
                                   jnp.asarray(h0), jnp.asarray(masks))

        # reference-style segmented torch run
        has_zeros = [0] + [t for t in range(1, T)
                           if (masks[t] == 0).any()] + [T]
        th = torch.tensor(h0.transpose(1, 0, 2)).contiguous()
        t_outs = []
        with torch.no_grad():
            for i in range(len(has_zeros) - 1):
                s, e = has_zeros[i], has_zeros[i + 1]
                th = th * torch.tensor(masks[s].reshape(1, B, 1))
                o, th = tg(torch.tensor(xs[s:e]), th.contiguous())
                t_outs.append(o)
        want = torch.cat(t_outs, 0).numpy()

        # compare pre-norm outputs: invert our LayerNorm by re-running core
        # — simpler: run our scan without norm by calling cells directly
        def body(h, xm):
            x, m = xm
            h = h * m[..., None]
            hi = gru._cell(params["layers"][0], x, h[:, 0])
            return jnp.stack([hi], 1), hi
        hfin2, raw_outs = jax.lax.scan(
            body, jnp.asarray(h0), (jnp.asarray(xs), jnp.asarray(masks)))
        np.testing.assert_allclose(np.asarray(raw_outs), want, atol=1e-4)
        np.testing.assert_allclose(np.asarray(h_fin), np.asarray(hfin2), atol=1e-6)


class TestActorCritic:
    @pytest.mark.parametrize("space", [
        sp.Discrete(5),
        sp.Box((3,)),
        sp.MultiDiscrete((5, 3)),
        sp.MultiBinary(4),
    ])
    @pytest.mark.parametrize("recurrent", [False, True])
    def test_forward_evaluate_shapes(self, space, recurrent):
        cfg = CFG.replace(use_recurrent_policy=recurrent)
        actor = actor_critic.Actor(cfg, sp.Box((8,)), space)
        params = actor.init(jax.random.PRNGKey(0))
        B = 6
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, 8))
        h = actor.init_rnn_state(B)
        masks = jnp.ones((B, 1))
        avail = jnp.ones((B, space.n)) if isinstance(space, sp.Discrete) else None

        a, lp, h2 = actor.forward(params, obs, h, masks,
                                  jax.random.PRNGKey(2), avail)
        assert a.shape == (B, sp.action_storage_dim(space))
        assert lp.shape == (B, sp.log_prob_dim(space))
        assert h2.shape == h.shape

        lp2, ent = actor.evaluate(params, obs, h, a, masks, avail,
                                  jnp.ones((B, 1)))
        np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp),
                                   rtol=1e-4, atol=1e-5)
        assert np.isfinite(float(ent))

    def test_deterministic_is_mode(self):
        actor = actor_critic.Actor(CFG, sp.Box((8,)), sp.Discrete(5))
        params = actor.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        h = actor.init_rnn_state(4)
        m = jnp.ones((4, 1))
        a1, _, _ = actor.forward(params, obs, h, m, jax.random.PRNGKey(2),
                                 deterministic=True)
        a2, _, _ = actor.forward(params, obs, h, m, jax.random.PRNGKey(3),
                                 deterministic=True)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_critic(self):
        critic = actor_critic.Critic(CFG, sp.Box((12,)))
        params = critic.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (6, 12))
        v, h = critic.forward(params, obs, critic.init_rnn_state(6),
                              jnp.ones((6, 1)))
        assert v.shape == (6, 1)

    def test_evaluate_seq_matches_stepwise(self):
        """Chunked sequence evaluation == step-by-step forward (recurrent)."""
        cfg = CFG.replace(use_recurrent_policy=True)
        actor = actor_critic.Actor(cfg, sp.Box((8,)), sp.Discrete(4))
        params = actor.init(jax.random.PRNGKey(0))
        L, B = 5, 3
        obs = jax.random.normal(jax.random.PRNGKey(1), (L, B, 8))
        masks = jnp.ones((L, B, 1)).at[2, 1].set(0.0)
        h0 = actor.init_rnn_state(B)
        actions = jax.random.randint(jax.random.PRNGKey(2), (L, B, 1), 0, 4
                                     ).astype(jnp.float32)

        lp_seq, _ = actor.evaluate_seq(params, obs, h0, actions, masks)

        h = h0
        lps = []
        for t in range(L):
            lp_t, _ = actor.evaluate(params, obs[t], h, actions[t], masks[t])
            lps.append(lp_t)
            _, _, h = actor.forward(params, obs[t], h, masks[t],
                                    jax.random.PRNGKey(9))
        np.testing.assert_allclose(np.asarray(lp_seq),
                                   np.stack([np.asarray(x) for x in lps]),
                                   rtol=1e-4, atol=1e-5)
