"""Weight-port golden tests vs the reference PyTorch modules.

Ports parameters from the reference `R_Actor`/`R_Critic`
(`/root/reference/onpolicy/algorithms/r_mappo/algorithm/r_actor_critic.py:12-175`)
into our functional `Actor`/`Critic` pytrees and asserts log-probs,
entropy, values, deterministic actions and recurrent states match to
fp32 tolerance on random batches — feed-forward, single-step recurrent,
and chunked-sequence recurrent (the reference's segment trick vs our
mask-gated scan). Covers Discrete, Box and MultiDiscrete heads, masked
available_actions, active_masks weighting, and the PopArt v_out.

This is the VERDICT round-1 item 3 deliverable: any divergence in base /
RNN / ACT math shows up here as a numeric mismatch.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.models.actor_critic import Actor, Critic
from onpolicy_tpu.utils import spaces as sp


# ---------------------------------------------------------------------------
# Reference import (torch modules only — no gym needed: the reference
# dispatches on `space.__class__.__name__`, which our space dataclasses
# share, and `get_shape_from_obs_space` only reads `.shape`).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    sys.modules.setdefault("gym", types.ModuleType("gym"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from onpolicy.algorithms.r_mappo.algorithm.r_actor_critic import (
        R_Actor, R_Critic)
    return types.SimpleNamespace(R_Actor=R_Actor, R_Critic=R_Critic)


class _Args:
    """argparse.Namespace twin built from our Config (same field names)."""

    def __init__(self, cfg):
        for f in ("hidden_size", "layer_N", "gain", "use_orthogonal",
                  "use_policy_active_masks", "use_naive_recurrent_policy",
                  "use_recurrent_policy", "recurrent_N", "use_ReLU",
                  "use_feature_normalization", "stacked_frames", "use_popart",
                  "algorithm_name"):
            setattr(self, f, getattr(cfg, f))


class MultiDiscrete:
    """Shim with the gym MultiDiscrete attrs the reference reads — the
    reference dispatches on the class NAME (`act.py:31-34`: high-low+1)."""

    def __init__(self, nvec):
        self.low = np.zeros(len(nvec), dtype=np.int64)
        self.high = np.asarray(nvec, dtype=np.int64) - 1


_RefMultiDiscrete = MultiDiscrete


def _cfg(**over):
    return config_from_args([], env_name="MPE", scenario_name="simple_spread",
                            num_agents=3, **over)


# ---------------------------------------------------------------------------
# Weight porting: torch state_dict -> our param pytrees
# ---------------------------------------------------------------------------

def _t2n(t):
    return t.detach().cpu().numpy()


def _port_base(sd, cfg, prefix="base."):
    base = {}
    if cfg.use_feature_normalization:
        base["feature_norm"] = {
            "scale": jnp.asarray(_t2n(sd[prefix + "feature_norm.weight"])),
            "bias": jnp.asarray(_t2n(sd[prefix + "feature_norm.bias"])),
        }
    layers = [{
        "lin": {"w": jnp.asarray(_t2n(sd[prefix + "mlp.fc1.0.weight"]).T),
                "b": jnp.asarray(_t2n(sd[prefix + "mlp.fc1.0.bias"]))},
        "ln": {"scale": jnp.asarray(_t2n(sd[prefix + "mlp.fc1.2.weight"])),
               "bias": jnp.asarray(_t2n(sd[prefix + "mlp.fc1.2.bias"]))},
    }]
    for i in range(cfg.layer_N):
        p = f"{prefix}mlp.fc2.{i}."
        layers.append({
            "lin": {"w": jnp.asarray(_t2n(sd[p + "0.weight"]).T),
                    "b": jnp.asarray(_t2n(sd[p + "0.bias"]))},
            "ln": {"scale": jnp.asarray(_t2n(sd[p + "2.weight"])),
                   "bias": jnp.asarray(_t2n(sd[p + "2.bias"]))},
        })
    base["layers"] = layers
    return base


def _port_rnn(sd, cfg, prefix="rnn."):
    layers = []
    for i in range(cfg.recurrent_N):
        layers.append({
            "w_ih": jnp.asarray(_t2n(sd[f"{prefix}rnn.weight_ih_l{i}"]).T),
            "w_hh": jnp.asarray(_t2n(sd[f"{prefix}rnn.weight_hh_l{i}"]).T),
            "b_ih": jnp.asarray(_t2n(sd[f"{prefix}rnn.bias_ih_l{i}"])),
            "b_hh": jnp.asarray(_t2n(sd[f"{prefix}rnn.bias_hh_l{i}"])),
        })
    return {"layers": layers,
            "norm": {"scale": jnp.asarray(_t2n(sd[prefix + "norm.weight"])),
                     "bias": jnp.asarray(_t2n(sd[prefix + "norm.bias"]))}}


def _port_act(sd, space):
    if isinstance(space, sp.Discrete):
        return {"out": {
            "w": jnp.asarray(_t2n(sd["act.action_out.linear.weight"]).T),
            "b": jnp.asarray(_t2n(sd["act.action_out.linear.bias"]))}}
    if isinstance(space, sp.Box):
        return {
            "mean": {
                "w": jnp.asarray(_t2n(sd["act.action_out.fc_mean.weight"]).T),
                "b": jnp.asarray(_t2n(sd["act.action_out.fc_mean.bias"]))},
            # AddBias stores [d, 1] (`distributions.py:106-117`)
            "log_std": jnp.asarray(
                _t2n(sd["act.action_out.logstd._bias"])[:, 0]),
        }
    if isinstance(space, sp.MultiDiscrete):
        heads = []
        for i in range(len(space.nvec)):
            p = f"act.action_outs.{i}.linear."
            heads.append({"w": jnp.asarray(_t2n(sd[p + "weight"]).T),
                          "b": jnp.asarray(_t2n(sd[p + "bias"]))})
        return {"heads": heads}
    raise TypeError(space)


def _port_actor(ref_actor, cfg, space):
    sd = ref_actor.state_dict()
    params = {"base": _port_base(sd, cfg), "act": _port_act(sd, space)}
    if cfg.is_recurrent:
        params["rnn"] = _port_rnn(sd, cfg)
    return params


def _port_critic(ref_critic, cfg):
    sd = ref_critic.state_dict()
    params = {"base": _port_base(sd, cfg),
              "v_out": {"w": jnp.asarray(_t2n(sd["v_out.weight"]).T),
                        "b": jnp.asarray(_t2n(sd["v_out.bias"]))}}
    if cfg.is_recurrent:
        params["rnn"] = _port_rnn(sd, cfg)
    return params


# ---------------------------------------------------------------------------
# Batch builders
# ---------------------------------------------------------------------------

def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _assert_close(a, b, atol=2e-5, what=""):
    np.testing.assert_allclose(np.asarray(a).reshape(-1),
                               np.asarray(b).reshape(-1),
                               atol=atol, rtol=1e-5, err_msg=what)


OBS_D, CENT_D, B, H = 18, 54, 64, 64


@pytest.mark.parametrize("recurrent", [False, True])
def test_actor_discrete_evaluate(ref, recurrent):
    cfg = _cfg(use_recurrent_policy=recurrent)
    space = sp.Discrete(5)
    torch.manual_seed(0)
    ra = ref.R_Actor(_Args(cfg), sp.Box((OBS_D,)), space)
    mine = Actor(cfg, sp.Box((OBS_D,)), space)
    params = _port_actor(ra, cfg, space)

    rng = np.random.default_rng(1)
    obs = _rand(rng, B, OBS_D)
    hxs = _rand(rng, B, cfg.recurrent_N, H) * 0.3
    masks = (rng.random((B, 1)) > 0.2).astype(np.float32)
    action = rng.integers(0, 5, (B, 1)).astype(np.float32)
    avail = (rng.random((B, 5)) > 0.3).astype(np.float32)
    avail[np.arange(B), action[:, 0].astype(int)] = 1.0  # taken action legal
    active = (rng.random((B, 1)) > 0.3).astype(np.float32)

    ref_lp, ref_ent = ra.evaluate_actions(
        torch.tensor(obs), torch.tensor(hxs), torch.tensor(action),
        torch.tensor(masks), torch.tensor(avail), torch.tensor(active))
    lp, ent = mine.evaluate(params, jnp.asarray(obs), jnp.asarray(hxs),
                            jnp.asarray(action), jnp.asarray(masks),
                            jnp.asarray(avail), jnp.asarray(active))
    _assert_close(lp, _t2n(ref_lp), what="log_probs")
    _assert_close(ent, _t2n(ref_ent), what="entropy")

    # deterministic forward: mode action + its log-prob + new rnn state
    ref_a, ref_alp, ref_h = ra(torch.tensor(obs), torch.tensor(hxs),
                               torch.tensor(masks), torch.tensor(avail),
                               deterministic=True)
    a, alp, h = mine.forward(params, jnp.asarray(obs), jnp.asarray(hxs),
                             jnp.asarray(masks), jax.random.PRNGKey(0),
                             jnp.asarray(avail), deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), _t2n(ref_a))
    _assert_close(alp, _t2n(ref_alp), what="fwd log_probs")
    if recurrent:
        _assert_close(h, _t2n(ref_h), what="rnn state")


def test_actor_discrete_sequence(ref):
    """Reference segment-split recurrence (`rnn.py:30-77`) vs our
    mask-gated scan, on a [T, N] chunk with mid-sequence resets."""
    cfg = _cfg()
    space = sp.Discrete(5)
    torch.manual_seed(2)
    ra = ref.R_Actor(_Args(cfg), sp.Box((OBS_D,)), space)
    mine = Actor(cfg, sp.Box((OBS_D,)), space)
    params = _port_actor(ra, cfg, space)

    T, N = 10, 8
    rng = np.random.default_rng(3)
    obs = _rand(rng, T, N, OBS_D)
    hxs0 = _rand(rng, N, cfg.recurrent_N, H) * 0.3
    masks = (rng.random((T, N, 1)) > 0.25).astype(np.float32)
    action = rng.integers(0, 5, (T, N, 1)).astype(np.float32)

    ref_lp, ref_ent = ra.evaluate_actions(
        torch.tensor(obs.reshape(T * N, -1)), torch.tensor(hxs0),
        torch.tensor(action.reshape(T * N, -1)),
        torch.tensor(masks.reshape(T * N, -1)))
    lp, ent = mine.evaluate_seq(params, jnp.asarray(obs), jnp.asarray(hxs0),
                                jnp.asarray(action), jnp.asarray(masks))
    _assert_close(lp, _t2n(ref_lp).reshape(T, N, 1), what="seq log_probs")
    _assert_close(ent, _t2n(ref_ent), what="seq entropy")


@pytest.mark.parametrize("recurrent", [False, True])
def test_actor_box_evaluate(ref, recurrent):
    cfg = _cfg(use_recurrent_policy=recurrent)
    space = sp.Box((4,))
    torch.manual_seed(4)
    ra = ref.R_Actor(_Args(cfg), sp.Box((OBS_D,)), space)
    # perturb log_std so the test isn't trivially at zero
    with torch.no_grad():
        ra.act.action_out.logstd._bias.uniform_(-0.5, 0.5)
    mine = Actor(cfg, sp.Box((OBS_D,)), space)
    params = _port_actor(ra, cfg, space)

    rng = np.random.default_rng(5)
    obs = _rand(rng, B, OBS_D)
    hxs = _rand(rng, B, cfg.recurrent_N, H) * 0.3
    masks = (rng.random((B, 1)) > 0.2).astype(np.float32)
    action = _rand(rng, B, 4)

    ref_lp, ref_ent = ra.evaluate_actions(
        torch.tensor(obs), torch.tensor(hxs), torch.tensor(action),
        torch.tensor(masks))
    lp, ent = mine.evaluate(params, jnp.asarray(obs), jnp.asarray(hxs),
                            jnp.asarray(action), jnp.asarray(masks))
    _assert_close(lp, _t2n(ref_lp), what="box log_probs")
    _assert_close(ent, _t2n(ref_ent), what="box entropy")


def test_actor_multidiscrete_evaluate(ref):
    cfg = _cfg(use_recurrent_policy=False)
    nvec = (5, 3)
    torch.manual_seed(6)
    ra = ref.R_Actor(_Args(cfg), sp.Box((OBS_D,)), _RefMultiDiscrete(nvec))
    space = sp.MultiDiscrete(nvec)
    mine = Actor(cfg, sp.Box((OBS_D,)), space)
    params = _port_actor(ra, cfg, space)

    rng = np.random.default_rng(7)
    obs = _rand(rng, B, OBS_D)
    hxs = np.zeros((B, cfg.recurrent_N, H), np.float32)
    masks = np.ones((B, 1), np.float32)
    action = np.stack([rng.integers(0, n, B) for n in nvec], -1
                      ).astype(np.float32)

    ref_lp, ref_ent = ra.evaluate_actions(
        torch.tensor(obs), torch.tensor(hxs), torch.tensor(action),
        torch.tensor(masks))
    lp, ent = mine.evaluate(params, jnp.asarray(obs), jnp.asarray(hxs),
                            jnp.asarray(action), jnp.asarray(masks))
    _assert_close(lp, _t2n(ref_lp), what="md log_probs")
    _assert_close(ent, _t2n(ref_ent), what="md entropy")


@pytest.mark.parametrize("recurrent,popart", [(False, False), (True, False),
                                              (True, True)])
def test_critic_values(ref, recurrent, popart):
    cfg = _cfg(use_recurrent_policy=recurrent, use_popart=popart,
               use_valuenorm=not popart)
    torch.manual_seed(8)
    rc = ref.R_Critic(_Args(cfg), sp.Box((CENT_D,)))
    mine = Critic(cfg, sp.Box((CENT_D,)))
    params = _port_critic(rc, cfg)

    rng = np.random.default_rng(9)
    cent = _rand(rng, B, CENT_D)
    hxs = _rand(rng, B, cfg.recurrent_N, H) * 0.3
    masks = (rng.random((B, 1)) > 0.2).astype(np.float32)

    ref_v, ref_h = rc(torch.tensor(cent), torch.tensor(hxs),
                      torch.tensor(masks))
    v, h = mine.forward(params, jnp.asarray(cent), jnp.asarray(hxs),
                        jnp.asarray(masks))
    _assert_close(v, _t2n(ref_v), what="values")
    if recurrent:
        _assert_close(h, _t2n(ref_h), what="critic rnn state")


def _port_ln(sd, name):
    return {"scale": jnp.asarray(_t2n(sd[name + ".weight"])),
            "bias": jnp.asarray(_t2n(sd[name + ".bias"]))}


def _port_lin(sd, name):
    p = {"w": jnp.asarray(_t2n(sd[name + ".weight"]).T)}
    if name + ".bias" in sd:
        p["b"] = jnp.asarray(_t2n(sd[name + ".bias"]))
    return p


def _port_attn(sd, pre):
    return {k: _port_lin(sd, f"{pre}.{k}") for k in
            ("key", "query", "value", "proj")}


def _port_mat(ref_mat, n_block, action_type="Discrete"):
    """Port reference MultiAgentTransformer weights
    (`ma_transformer.py:111-221`) into our mat_init pytree layout."""
    sd = ref_mat.state_dict()
    enc = {
        "obs_ln": _port_ln(sd, "encoder.obs_encoder.0"),
        "obs_embed": _port_lin(sd, "encoder.obs_encoder.1"),
        "ln": _port_ln(sd, "encoder.ln"),
        "blocks": [{
            "ln1": _port_ln(sd, f"encoder.blocks.{i}.ln1"),
            "ln2": _port_ln(sd, f"encoder.blocks.{i}.ln2"),
            "attn": _port_attn(sd, f"encoder.blocks.{i}.attn"),
            "mlp": {"fc1": _port_lin(sd, f"encoder.blocks.{i}.mlp.0"),
                    "fc2": _port_lin(sd, f"encoder.blocks.{i}.mlp.2")},
        } for i in range(n_block)],
        "head1": _port_lin(sd, "encoder.head.0"),
        "head_ln": _port_ln(sd, "encoder.head.2"),
        "head2": _port_lin(sd, "encoder.head.3"),
    }
    dec = {
        "act_embed": _port_lin(sd, "decoder.action_encoder.0"),
        "obs_ln": _port_ln(sd, "decoder.obs_encoder.0"),
        "obs_embed": _port_lin(sd, "decoder.obs_encoder.1"),
        "ln": _port_ln(sd, "decoder.ln"),
        "blocks": [{
            "ln1": _port_ln(sd, f"decoder.blocks.{i}.ln1"),
            "ln2": _port_ln(sd, f"decoder.blocks.{i}.ln2"),
            "ln3": _port_ln(sd, f"decoder.blocks.{i}.ln3"),
            "attn1": _port_attn(sd, f"decoder.blocks.{i}.attn1"),
            "attn2": _port_attn(sd, f"decoder.blocks.{i}.attn2"),
            "mlp": {"fc1": _port_lin(sd, f"decoder.blocks.{i}.mlp.0"),
                    "fc2": _port_lin(sd, f"decoder.blocks.{i}.mlp.2")},
        } for i in range(n_block)],
        "head1": _port_lin(sd, "decoder.head.0"),
        "head_ln": _port_ln(sd, "decoder.head.2"),
        "head2": _port_lin(sd, "decoder.head.3"),
    }
    if action_type != "Discrete":
        dec["log_std"] = jnp.asarray(_t2n(sd["decoder.log_std"]))
    return {"encoder": enc, "decoder": dec}


@pytest.fixture(scope="module")
def ref_mat():
    sys.modules.setdefault("gym", types.ModuleType("gym"))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from onpolicy.algorithms.mat.algorithm.ma_transformer import (
        MultiAgentTransformer)
    return MultiAgentTransformer


@pytest.mark.parametrize("avail", [False, True])
def test_mat_discrete_parallel(ref_mat, avail):
    from onpolicy_tpu.models import transformer as tf
    M, A, NB, NE, NH = 3, 5, 2, 64, 1
    torch.manual_seed(20)
    rm = ref_mat(state_dim=37, obs_dim=OBS_D, action_dim=A, n_agent=M,
                 n_block=NB, n_embd=NE, n_head=NH)
    params = _port_mat(rm, NB)
    mcfg = tf.MATConfig(M, A, NB, NE, NH)

    rng = np.random.default_rng(21)
    Bm = 32
    obs = _rand(rng, Bm, M, OBS_D)
    action = rng.integers(0, A, (Bm, M, 1)).astype(np.float32)
    av = None
    if avail:
        av = (rng.random((Bm, M, A)) > 0.3).astype(np.float32)
        av[..., 0] = 1.0
        idx = action[..., 0].astype(int)
        for b in range(Bm):
            av[b, np.arange(M), idx[b]] = 1.0

    state = np.zeros((Bm, M, 37), np.float32)
    ref_lp, ref_v, ref_ent = rm(state, obs, action,
                                None if av is None else av)
    lp, v, ent = tf.parallel_act(mcfg, params, jnp.asarray(obs),
                                 jnp.asarray(action),
                                 None if av is None else jnp.asarray(av))
    _assert_close(lp, _t2n(ref_lp), what="mat log_probs")
    _assert_close(v, _t2n(ref_v), what="mat values")
    _assert_close(ent, _t2n(ref_ent), what="mat entropy")


def test_mat_discrete_autoregressive(ref_mat):
    from onpolicy_tpu.models import transformer as tf
    M, A, NB, NE, NH = 3, 5, 2, 64, 2
    torch.manual_seed(22)
    rm = ref_mat(state_dim=37, obs_dim=OBS_D, action_dim=A, n_agent=M,
                 n_block=NB, n_embd=NE, n_head=NH)
    params = _port_mat(rm, NB)
    mcfg = tf.MATConfig(M, A, NB, NE, NH)

    rng = np.random.default_rng(23)
    Bm = 32
    obs = _rand(rng, Bm, M, OBS_D)
    av = (rng.random((Bm, M, A)) > 0.3).astype(np.float32)
    av[..., 0] = 1.0

    ref_a, ref_lp, ref_v = rm.get_actions(None, obs, av, deterministic=True)
    a, lp, v = tf.autoregressive_act(mcfg, params, jnp.asarray(obs),
                                     jax.random.PRNGKey(0), jnp.asarray(av),
                                     deterministic=True)
    np.testing.assert_array_equal(np.asarray(a)[..., 0],
                                  _t2n(ref_a)[..., 0])
    _assert_close(lp, _t2n(ref_lp), what="mat ar log_probs")
    _assert_close(v, _t2n(ref_v), what="mat ar values")


def test_mat_continuous_parallel(ref_mat):
    from onpolicy_tpu.models import transformer as tf
    M, A, NB, NE, NH = 3, 4, 1, 64, 1
    torch.manual_seed(24)
    rm = ref_mat(state_dim=37, obs_dim=OBS_D, action_dim=A, n_agent=M,
                 n_block=NB, n_embd=NE, n_head=NH, action_type="Continuous")
    with torch.no_grad():
        rm.decoder.log_std.uniform_(0.3, 1.2)
    params = _port_mat(rm, NB, "Continuous")
    mcfg = tf.MATConfig(M, A, NB, NE, NH, action_type="Continuous")

    rng = np.random.default_rng(25)
    Bm = 32
    obs = _rand(rng, Bm, M, OBS_D)
    action = _rand(rng, Bm, M, A) * 0.3

    state = np.zeros((Bm, M, 37), np.float32)
    ref_lp, ref_v, ref_ent = rm(state, obs, action)
    lp, v, ent = tf.parallel_act(mcfg, params, jnp.asarray(obs),
                                 jnp.asarray(action))
    _assert_close(lp, _t2n(ref_lp), what="mat cont log_probs")
    _assert_close(v, _t2n(ref_v), what="mat cont values")
    _assert_close(ent, _t2n(ref_ent), what="mat cont entropy")


def test_critic_sequence(ref):
    cfg = _cfg()
    torch.manual_seed(10)
    rc = ref.R_Critic(_Args(cfg), sp.Box((CENT_D,)))
    mine = Critic(cfg, sp.Box((CENT_D,)))
    params = _port_critic(rc, cfg)

    T, N = 10, 8
    rng = np.random.default_rng(11)
    cent = _rand(rng, T, N, CENT_D)
    hxs0 = _rand(rng, N, cfg.recurrent_N, H) * 0.3
    masks = (rng.random((T, N, 1)) > 0.25).astype(np.float32)

    ref_v, _ = rc(torch.tensor(cent.reshape(T * N, -1)), torch.tensor(hxs0),
                  torch.tensor(masks.reshape(T * N, -1)))
    v = mine.forward_seq(params, jnp.asarray(cent), jnp.asarray(hxs0),
                         jnp.asarray(masks))
    _assert_close(v, _t2n(ref_v).reshape(T, N, 1), what="seq values")
