"""Parity of the fused Pallas GRU kernel vs the lax.scan reference path.

On CPU (this suite) the kernel runs in Pallas interpreter mode; the same
code compiles via Mosaic on TPU. Forward outputs, final hidden states,
and every gradient (inputs, initial hidden, all weights/biases) must
match the scan implementation, which itself is torch-parity-tested
(test_models.py::TestGRUTorchParity).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onpolicy_tpu.config import Config
from onpolicy_tpu.models import gru
from onpolicy_tpu.ops import pallas_gru


def _setup(T=7, B=5, D=12, H=16, layers=1, seed=0):
    cfg = Config(hidden_size=H, recurrent_N=layers)
    key = jax.random.PRNGKey(seed)
    params = gru.init(key, cfg, D)
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
    xs = jax.random.normal(k1, (T, B, D), jnp.float32)
    hxs = jax.random.normal(k2, (B, layers, H), jnp.float32)
    # episode-boundary pattern: zeros sprinkled in
    masks = (jax.random.uniform(k3, (T, B, 1)) > 0.3).astype(jnp.float32)
    return cfg, params, xs, hxs, masks


@pytest.mark.parametrize("layers", [1, 2])
def test_forward_matches_scan(layers):
    cfg, params, xs, hxs, masks = _setup(layers=layers)
    out_ref, h_ref = gru.sequence(cfg, params, xs, hxs, masks)
    out_pl, h_pl = pallas_gru.sequence(cfg, params, xs, hxs, masks)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_pl, h_ref, rtol=1e-5, atol=1e-5)


def test_forward_matches_scan_large_batch():
    # B > 128 exercises multiple batch tiles in the kernel grid
    cfg, params, xs, hxs, masks = _setup(T=4, B=130, D=8, H=8)
    out_ref, h_ref = gru.sequence(cfg, params, xs, hxs, masks)
    out_pl, h_pl = pallas_gru.sequence(cfg, params, xs, hxs, masks)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_pl, h_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layers", [1, 2])
def test_gradients_match_scan(layers):
    cfg, params, xs, hxs, masks = _setup(layers=layers)
    kw = jax.random.PRNGKey(9)
    w_out = jax.random.normal(kw, (cfg.hidden_size, 3), jnp.float32)

    def loss(fn, params, xs, hxs):
        outs, hT = fn(cfg, params, xs, hxs, masks)
        return jnp.sum((outs @ w_out) ** 2) + jnp.sum(hT * hT)

    g_ref = jax.grad(lambda *a: loss(gru.sequence, *a),
                     argnums=(0, 1, 2))(params, xs, hxs)
    g_pl = jax.grad(lambda *a: loss(pallas_gru.sequence, *a),
                    argnums=(0, 1, 2))(params, xs, hxs)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pl, tree = jax.tree_util.tree_flatten(g_pl)
    assert len(flat_ref) == len(flat_pl)
    for a, b in zip(flat_pl, flat_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_config_flag_dispatch():
    cfg, params, xs, hxs, masks = _setup()
    cfg_on = cfg.replace(use_pallas_gru=True)
    out_flag, h_flag = gru.sequence(cfg_on, params, xs, hxs, masks)
    out_pl, h_pl = pallas_gru.sequence(cfg, params, xs, hxs, masks)
    np.testing.assert_allclose(np.asarray(out_flag), np.asarray(out_pl))
    np.testing.assert_allclose(np.asarray(h_flag), np.asarray(h_pl))


def test_training_step_equivalence():
    """A full recurrent PPO-style grad step agrees between paths."""
    cfg, params, xs, hxs, masks = _setup(T=10, B=12, D=6, H=8)

    def actor_loss(params, use_pallas):
        c = cfg.replace(use_pallas_gru=use_pallas)
        outs, _ = gru.sequence(c, params, xs, hxs, masks)
        return jnp.mean(jax.nn.log_softmax(outs)[..., 0])

    g0 = jax.grad(actor_loss)(params, False)
    g1 = jax.grad(actor_loss)(params, True)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_auto_enable_policy(monkeypatch):
    """use_pallas_gru=None → AUTO: TPU + H>=256 f32 / H>=512 bf16
    (H%128==0); explicit True/False always wins (gru._use_pallas)."""
    from onpolicy_tpu.config import Config

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert gru._use_pallas(Config(hidden_size=512))
    assert gru._use_pallas(Config(hidden_size=256))
    assert not gru._use_pallas(Config(hidden_size=64))       # dispatch floor
    assert not gru._use_pallas(Config(hidden_size=300))      # lane-misaligned
    assert gru._use_pallas(Config(hidden_size=512, use_bf16=True))
    assert not gru._use_pallas(Config(hidden_size=256, use_bf16=True))
    assert not gru._use_pallas(Config(hidden_size=512,
                                      use_pallas_gru=False))
    assert gru._use_pallas(Config(hidden_size=64, use_pallas_gru=True))

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not gru._use_pallas(Config(hidden_size=512))
    assert gru._use_pallas(Config(hidden_size=512, use_pallas_gru=True))


def test_auto_enable_excludes_hatrpo(monkeypatch):
    """HATRPO's fisher-vector product is jax.jvp over the KL gradient;
    jvp through a custom_vjp function is unsupported, so AUTO never
    routes the TRPO path to the kernel (code-review r4 finding)."""
    from onpolicy_tpu.config import Config

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not gru._use_pallas(Config(hidden_size=512,
                                      algorithm_name="hatrpo",
                                      share_policy=False))
    assert gru._use_pallas(Config(hidden_size=512,
                                  algorithm_name="happo",
                                  share_policy=False))


@pytest.mark.parametrize("layers", [1, 2])
def test_bf16_path_tracks_f32_reference(layers):
    """The bf16 kernel path (bf16 sequence streams, f32 scratch/weights/
    accumulators) must track the F32 scan reference about as well as
    the bf16 scan does — the two bf16 paths round differently (the
    kernel carries h in f32), so each is compared against the f32
    truth, and the kernel's error must not exceed the scan's by more
    than bf16 noise (round-4 VERDICT weak 2: the kernel's bf16 story)."""
    cfg, params, xs, hxs, masks = _setup(layers=layers)
    cfg16 = cfg.replace(use_bf16=True)

    def loss(fn, c):
        def f(params):
            out, hT = fn(c, params, xs, hxs, masks)
            return jnp.sum(out.astype(jnp.float32) ** 2) \
                + jnp.sum(hT * 1.5)
        return f

    out32, h32 = gru.sequence(cfg, params, xs, hxs, masks)
    out16, _ = pallas_gru.sequence(cfg16, params, xs, hxs, masks)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.float32(out16), np.float32(out32),
                               rtol=5e-2, atol=5e-2)

    g32 = jax.grad(loss(gru.sequence, cfg))(params)
    g16s = jax.grad(loss(gru.sequence, cfg16))(params)
    g16p = jax.grad(loss(pallas_gru.sequence, cfg16))(params)
    leaves = zip(jax.tree_util.tree_leaves(g16p),
                 jax.tree_util.tree_leaves(g16s),
                 jax.tree_util.tree_leaves(g32))
    for a, s, b in leaves:
        scale = max(1.0, float(np.max(np.abs(np.float32(b)))))
        err_pl = float(np.max(np.abs(np.float32(a) - np.float32(b)))) \
            / scale
        err_scan = float(np.max(np.abs(np.float32(s) - np.float32(b)))) \
            / scale
        assert err_pl <= max(3.0 * err_scan, 0.02), (err_pl, err_scan)
