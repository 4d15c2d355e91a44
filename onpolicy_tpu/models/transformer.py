"""Multi-Agent Transformer (MAT) networks.

Re-derivation of `/root/reference/onpolicy/algorithms/mat/algorithm/
ma_transformer.py` + `transformer_act.py` as functional modules.

Architecture (attention runs over the AGENT axis, L = n_agent):
  Encoder: obs LayerNorm→Linear→GELU embed → LN → n_block blocks of
    [x = LN(x + attn(x)); x = LN(x + mlp(x))] → value head and per-agent
    representation;
  Decoder: shifted one-hot previous-agent actions embedded (bias-free
    Linear(A+1)) → n_block blocks of
    [x = LN(x + masked-attn(x)); x = LN(rep + masked-attn(q=rep, kv=x));
     x = LN(x + mlp(x))] with causal (lower-triangular) agent masking →
    per-agent logits;
  dec_actor variant: plain per-agent (or shared) MLPs over obs instead.

Init: orthogonal, gain 0.01 on projections, relu-gain on pre-GELU
layers, zero bias (`ma_transformer.py:13-16`).

Decoding: `autoregressive_act` loops agents inside `lax.fori_loop`
(rollout; each agent's one-hot feeds the next slot), `parallel_act`
teacher-forces shifted actions in one decoder pass (training) —
`transformer_act.py:6-42`. Continuous actions use σ(log_std)·0.5 std
(`transformer_act.py:45-85`).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm
from onpolicy_tpu.ops import distributions as D

GAIN = 0.01

# torch nn.GELU default is the exact erf form (ma_transformer.py:78,104);
# jax.nn.gelu defaults to the tanh approximation.
_gelu = functools.partial(jax.nn.gelu, approximate=False)


def _lin(key, din, dout, activate=False, bias=True):
    gain = cm.calculate_gain("relu") if activate else GAIN
    p = cm.linear_init(key, din, dout, gain=gain, use_orthogonal=True)
    if not bias:
        p = {"w": p["w"]}
    return p


def _lin_apply(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


# ---- attention ------------------------------------------------------

def attn_init(key, n_embd):
    ks = jax.random.split(key, 4)
    return {"key": _lin(ks[0], n_embd, n_embd),
            "query": _lin(ks[1], n_embd, n_embd),
            "value": _lin(ks[2], n_embd, n_embd),
            "proj": _lin(ks[3], n_embd, n_embd)}


def attn_apply(p, k_in, v_in, q_in, n_head: int, masked: bool):
    """k/v/q: [B, L, D] → [B, L, D]; optional causal agent mask."""
    B, L, Dm = q_in.shape
    hs = Dm // n_head
    split = lambda x: x.reshape(B, L, n_head, hs).transpose(0, 2, 1, 3)
    k = split(_lin_apply(p["key"], k_in))
    q = split(_lin_apply(p["query"], q_in))
    v = split(_lin_apply(p["value"], v_in))
    att = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hs)
    if masked:
        causal = jnp.tril(jnp.ones((L, L), bool))
        att = jnp.where(causal[None, None], att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    y = (att @ v).transpose(0, 2, 1, 3).reshape(B, L, Dm)
    return _lin_apply(p["proj"], y)


def _mlp_block_init(key, n_embd):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, n_embd, n_embd, activate=True),
            "fc2": _lin(k2, n_embd, n_embd)}


def _mlp_block_apply(p, x):
    return _lin_apply(p["fc2"], _gelu(_lin_apply(p["fc1"], x)))


# ---- encoder --------------------------------------------------------

def encoder_init(key, obs_dim, n_block, n_embd):
    ks = jax.random.split(key, n_block + 4)
    return {
        "obs_ln": cm.layer_norm_init(obs_dim),
        "obs_embed": _lin(ks[0], obs_dim, n_embd, activate=True),
        "ln": cm.layer_norm_init(n_embd),
        "blocks": [{
            "ln1": cm.layer_norm_init(n_embd),
            "ln2": cm.layer_norm_init(n_embd),
            "attn": attn_init(jax.random.fold_in(ks[1], i), n_embd),
            "mlp": _mlp_block_init(jax.random.fold_in(ks[2], i), n_embd),
        } for i in range(n_block)],
        "head1": _lin(ks[3], n_embd, n_embd, activate=True),
        "head_ln": cm.layer_norm_init(n_embd),
        "head2": _lin(jax.random.fold_in(ks[3], 1), n_embd, 1),
    }


def encoder_apply(p, obs, n_head):
    """obs [B, M, Do] → (v_loc [B, M, 1], rep [B, M, D])."""
    x = _gelu(_lin_apply(p["obs_embed"],
                               cm.layer_norm_apply(p["obs_ln"], obs)))
    x = cm.layer_norm_apply(p["ln"], x)
    for blk in p["blocks"]:
        x = cm.layer_norm_apply(
            blk["ln1"], x + attn_apply(blk["attn"], x, x, x, n_head, False))
        x = cm.layer_norm_apply(blk["ln2"], x + _mlp_block_apply(blk["mlp"], x))
    h = _gelu(_lin_apply(p["head1"], x))
    v = _lin_apply(p["head2"], cm.layer_norm_apply(p["head_ln"], h))
    return v, x


# ---- decoder --------------------------------------------------------

def decoder_init(key, obs_dim, action_dim, n_block, n_embd, n_agent,
                 action_type="Discrete", dec_actor=False, share_actor=False):
    ks = jax.random.split(key, n_block + 5)
    p = {}
    if action_type != "Discrete":
        p["log_std"] = jnp.ones((action_dim,), jnp.float32)
    if dec_actor:
        def actor_mlp(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {"ln0": cm.layer_norm_init(obs_dim),
                    "fc1": _lin(k1, obs_dim, n_embd, activate=True),
                    "ln1": cm.layer_norm_init(n_embd),
                    "fc2": _lin(k2, n_embd, n_embd, activate=True),
                    "ln2": cm.layer_norm_init(n_embd),
                    "out": _lin(k3, n_embd, action_dim)}
        if share_actor:
            p["mlp"] = actor_mlp(ks[0])
        else:
            p["mlps"] = [actor_mlp(jax.random.fold_in(ks[0], i))
                         for i in range(n_agent)]
        return p
    act_in = action_dim + 1 if action_type == "Discrete" else action_dim
    p.update({
        "act_embed": _lin(ks[0], act_in, n_embd, activate=True,
                          bias=(action_type != "Discrete")),
        "obs_ln": cm.layer_norm_init(obs_dim),
        "obs_embed": _lin(ks[1], obs_dim, n_embd, activate=True),
        "ln": cm.layer_norm_init(n_embd),
        "blocks": [{
            "ln1": cm.layer_norm_init(n_embd),
            "ln2": cm.layer_norm_init(n_embd),
            "ln3": cm.layer_norm_init(n_embd),
            "attn1": attn_init(jax.random.fold_in(ks[2], i), n_embd),
            "attn2": attn_init(jax.random.fold_in(ks[3], i), n_embd),
            "mlp": _mlp_block_init(jax.random.fold_in(ks[4], i), n_embd),
        } for i in range(n_block)],
        "head1": _lin(jax.random.fold_in(ks[4], 101), n_embd, n_embd,
                      activate=True),
        "head_ln": cm.layer_norm_init(n_embd),
        "head2": _lin(jax.random.fold_in(ks[4], 102), n_embd, action_dim),
    })
    return p


def decoder_apply(p, shifted_action, obs_rep, obs, n_head,
                  dec_actor=False, share_actor=False):
    """→ per-agent logits/means [B, M, A]."""
    if dec_actor:
        if share_actor:
            mlps = [p["mlp"]] * obs.shape[1]
        else:
            mlps = p["mlps"]
        outs = []
        for i, mp in enumerate(mlps):
            h = cm.layer_norm_apply(mp["ln0"], obs[:, i])
            h = cm.layer_norm_apply(mp["ln1"],
                                    _gelu(_lin_apply(mp["fc1"], h)))
            h = cm.layer_norm_apply(mp["ln2"],
                                    _gelu(_lin_apply(mp["fc2"], h)))
            outs.append(_lin_apply(mp["out"], h))
        return jnp.stack(outs, axis=1)
    x = _gelu(_lin_apply(p["act_embed"], shifted_action))
    x = cm.layer_norm_apply(p["ln"], x)
    for blk in p["blocks"]:
        x = cm.layer_norm_apply(
            blk["ln1"], x + attn_apply(blk["attn1"], x, x, x, n_head, True))
        x = cm.layer_norm_apply(
            blk["ln2"],
            obs_rep + attn_apply(blk["attn2"], x, x, obs_rep, n_head, True))
        x = cm.layer_norm_apply(blk["ln3"], x + _mlp_block_apply(blk["mlp"], x))
    h = _gelu(_lin_apply(p["head1"], x))
    return _lin_apply(p["head2"], cm.layer_norm_apply(p["head_ln"], h))


# ---- full model -----------------------------------------------------

def mat_init(key, obs_dim, action_dim, n_agent, n_block, n_embd,
             action_type="Discrete", dec_actor=False, share_actor=False,
             encoder_dim=None):
    """encoder_dim: encoder input width — obs_dim normally, the
    centralized-state width under encode_state."""
    ke, kd = jax.random.split(key)
    return {
        "encoder": encoder_init(ke, encoder_dim or obs_dim, n_block, n_embd),
        "decoder": decoder_init(kd, obs_dim, action_dim, n_block, n_embd,
                                n_agent, action_type, dec_actor, share_actor),
    }


class MATConfig:
    def __init__(self, n_agent, action_dim, n_block, n_embd, n_head,
                 action_type="Discrete", dec_actor=False, share_actor=False,
                 encode_state=False):
        self.n_agent = n_agent
        self.action_dim = action_dim
        self.n_block = n_block
        self.n_embd = n_embd
        self.n_head = n_head
        self.action_type = action_type
        self.dec_actor = dec_actor
        self.share_actor = share_actor
        self.encode_state = encode_state


def autoregressive_act(mcfg: MATConfig, params, obs, key,
                       available_actions=None, deterministic=False,
                       enc_in=None):
    """Rollout decode: sequential over agents inside the jitted program
    (`discrete_autoregreesive_act`). → (actions [B,M,1], logp [B,M,1],
    values [B,M,1]). `enc_in` overrides the encoder input (centralized
    state under encode_state)."""
    B, M, _ = obs.shape
    A = mcfg.action_dim
    v_loc, obs_rep = encoder_apply(
        params["encoder"], enc_in if enc_in is not None else obs,
        mcfg.n_head)

    if mcfg.action_type == "Discrete":
        shifted = jnp.zeros((B, M, A + 1)).at[:, 0, 0].set(1.0)
        actions0 = jnp.zeros((B, M, 1), jnp.int32)
        logp0 = jnp.zeros((B, M, 1), jnp.float32)

        def body(i, carry):
            shifted, actions, logp = carry
            logits = decoder_apply(params["decoder"], shifted, obs_rep, obs,
                                   mcfg.n_head, mcfg.dec_actor,
                                   mcfg.share_actor)
            logit_i = jax.lax.dynamic_index_in_dim(logits, i, 1, False)
            if available_actions is not None:
                avail_i = jax.lax.dynamic_index_in_dim(
                    available_actions, i, 1, False)
                logit_i = D.mask_logits(logit_i, avail_i)
            dist = D.Categorical(logit_i)
            a = dist.mode() if deterministic else dist.sample(
                jax.random.fold_in(key, i))
            lp = dist.log_prob(a)
            actions = jax.lax.dynamic_update_index_in_dim(
                actions, a.astype(jnp.int32), i, 1)
            logp = jax.lax.dynamic_update_index_in_dim(logp, lp, i, 1)
            onehot = jax.nn.one_hot(a[..., 0], A)
            next_slot = jnp.concatenate(
                [jnp.zeros((B, 1)), onehot], axis=-1)[:, None, :]
            shifted = jax.lax.cond(
                i + 1 < M,
                lambda s: jax.lax.dynamic_update_slice_in_dim(
                    s, next_slot, i + 1, 1),
                lambda s: s, shifted)
            return shifted, actions, logp

        _, actions, logp = jax.lax.fori_loop(0, M, body,
                                             (shifted, actions0, logp0))
        return actions.astype(jnp.float32), logp, v_loc
    else:
        shifted = jnp.zeros((B, M, A))
        actions0 = jnp.zeros((B, M, A), jnp.float32)
        logp0 = jnp.zeros((B, M, A), jnp.float32)
        std = jax.nn.sigmoid(params["decoder"]["log_std"]) * 0.5

        def body(i, carry):
            shifted, actions, logp = carry
            mean = decoder_apply(params["decoder"], shifted, obs_rep, obs,
                                 mcfg.n_head, mcfg.dec_actor, mcfg.share_actor)
            mean_i = jax.lax.dynamic_index_in_dim(mean, i, 1, False)
            dist = D.DiagGaussian(mean_i, jnp.log(std)[None])
            a = mean_i if deterministic else dist.sample(
                jax.random.fold_in(key, i))
            # per-dim log prob (reference keeps per-dim, :59-62)
            lp = -0.5 * (jnp.square((a - mean_i) / std)
                         + jnp.log(2 * jnp.pi) + 2 * jnp.log(std))
            actions = jax.lax.dynamic_update_index_in_dim(actions, a, i, 1)
            logp = jax.lax.dynamic_update_index_in_dim(logp, lp, i, 1)
            shifted = jax.lax.cond(
                i + 1 < M,
                lambda s: jax.lax.dynamic_update_slice_in_dim(
                    s, a[:, None, :], i + 1, 1),
                lambda s: s, shifted)
            return shifted, actions, logp

        _, actions, logp = jax.lax.fori_loop(0, M, body,
                                             (shifted, actions0, logp0))
        return actions, logp, v_loc


def parallel_act(mcfg: MATConfig, params, obs, actions,
                 available_actions=None, enc_in=None):
    """Training decode: teacher-forced one pass
    (`discrete_parallel_act`). → (logp [B,M,1], values [B,M,1],
    entropy [B,M,1])."""
    B, M, _ = obs.shape
    A = mcfg.action_dim
    v_loc, obs_rep = encoder_apply(
        params["encoder"], enc_in if enc_in is not None else obs,
        mcfg.n_head)
    if mcfg.action_type == "Discrete":
        a_int = actions[..., 0].astype(jnp.int32)
        onehot = jax.nn.one_hot(a_int, A)
        shifted = jnp.zeros((B, M, A + 1)).at[:, 0, 0].set(1.0)
        shifted = shifted.at[:, 1:, 1:].set(onehot[:, :-1])
        logits = decoder_apply(params["decoder"], shifted, obs_rep, obs,
                               mcfg.n_head, mcfg.dec_actor, mcfg.share_actor)
        logits = D.mask_logits(logits, available_actions)
        dist = D.Categorical(logits)
        logp = dist.log_prob(actions[..., :1])
        entropy = dist.entropy()[..., None]
        return logp, v_loc, entropy
    else:
        shifted = jnp.zeros((B, M, A)).at[:, 1:, :].set(actions[:, :-1])
        mean = decoder_apply(params["decoder"], shifted, obs_rep, obs,
                             mcfg.n_head, mcfg.dec_actor, mcfg.share_actor)
        std = jax.nn.sigmoid(params["decoder"]["log_std"]) * 0.5
        lp = -0.5 * (jnp.square((actions - mean) / std)
                     + jnp.log(2 * jnp.pi) + 2 * jnp.log(std))
        ent = jnp.broadcast_to(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std),
                               mean.shape)
        return lp, v_loc, ent


def get_values(mcfg: MATConfig, params, obs):
    v_loc, _ = encoder_apply(params["encoder"], obs, mcfg.n_head)
    return v_loc
