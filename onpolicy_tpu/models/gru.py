"""Mask-gated multi-layer GRU with output LayerNorm.

Re-derivation of the reference's RNNLayer
(`/root/reference/onpolicy/algorithms/utils/rnn.py`). Two modes:

  * single step (rollout): hidden state is multiplied by the episode mask
    before the cell (`rnn.py:25-29`);
  * sequence (training): the reference splits the time axis into
    contiguous segments at mask-zero steps and runs cuDNN GRU per segment
    (`rnn.py:30-77`). Mathematically the segment trick equals gating
    `h ← h·mask_t` at every step — segments start from h·mask and masks
    are 1 inside a segment. We implement the branch-free gated form as a
    single `lax.scan`, which XLA fuses into one device loop (no
    data-dependent control flow).

Gate math matches torch.nn.GRU (reset/update/new, b_ih and b_hh kept as
separate bias vectors so the r·(W_hn h + b_hn) coupling is exact).
Hidden-state layout at the API boundary: [batch, recurrent_N, H]
(the buffer's rnn_states layout, `shared_buffer.py:58-61`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm


def init(key, cfg, input_dim: int):
    H = cfg.hidden_size
    layers = []
    d_in = input_dim
    for i in range(cfg.recurrent_N):
        k = jax.random.fold_in(key, i)
        k_ih, k_hh = jax.random.split(k)
        init_fn = cm.orthogonal if cfg.use_orthogonal else cm.xavier_uniform
        layers.append({
            # [in, 3H] / [H, 3H]; gate order (r, z, n) like torch
            "w_ih": init_fn(k_ih, (d_in, 3 * H), 1.0),
            "w_hh": init_fn(k_hh, (H, 3 * H), 1.0),
            "b_ih": jnp.zeros((3 * H,), jnp.float32),
            "b_hh": jnp.zeros((3 * H,), jnp.float32),
        })
        d_in = H
    return {"layers": layers, "norm": cm.layer_norm_init(H)}


def _cell(layer, x, h):
    """One GRU cell step. x: [B, in], h: [B, H] → h': [B, H]."""
    H = h.shape[-1]
    gi = x @ layer["w_ih"] + layer["b_ih"]
    gh = h @ layer["w_hh"] + layer["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def step(cfg, params, x: jax.Array, hxs: jax.Array, masks: jax.Array):
    """Single rollout step.

    x: [B, in]; hxs: [B, recurrent_N, H]; masks: [B, 1].
    Returns (out [B, H], new_hxs [B, recurrent_N, H] fp32).
    """
    dt = cm.compute_dtype(cfg)
    params = cm.cast_floats(params, dt)
    m = masks[..., None].astype(dt)           # [B, 1, 1]
    hxs = hxs.astype(dt) * m
    x = x.astype(dt)
    new_h = []
    inp = x
    for i, layer in enumerate(params["layers"]):
        h = _cell(layer, inp, hxs[:, i])
        new_h.append(h)
        inp = h
    out = cm.layer_norm_apply(params["norm"], inp)
    return out, jnp.stack(new_h, axis=1).astype(jnp.float32)


def _use_pallas(cfg) -> bool:
    """Route sequence mode through the fused Pallas kernel?

    Explicit True/False wins. Default (None) = AUTO: on for TPU runs at
    the widths where the ON-CHIP gate passed AND the kernel beats the
    scan — f32: H ≥ 256 (grad step 1.16× at H=256, 1.21–1.26× at H=512
    after the round-4 VMEM-budget/tile fix); bf16 (round-5 kernel bf16
    streams): H ≥ 512 only (grad 1.08–1.24× at H=512; H=256 bf16 is a
    wash at 1.01–1.04×, scripts/bench_pallas_gru.py --bf16). At H=64
    both paths sit at the dispatch floor and large-batch H=64 is a
    regression (0.75×), so the scan stays."""
    explicit = getattr(cfg, "use_pallas_gru", None)
    if explicit is not None:
        return bool(explicit)
    # HATRPO's Fisher-vector product is forward-over-reverse
    # (jax.jvp of the KL gradient, hatrpo.py) and jvp through a
    # custom_vjp function is unsupported — auto never routes it to the
    # kernel (explicit True still forces, and will raise there).
    if getattr(cfg, "algorithm_name", "") == "hatrpo":
        return False
    H = cfg.hidden_size
    min_h = 512 if getattr(cfg, "use_bf16", False) else 256
    return (jax.default_backend() == "tpu" and H >= min_h
            and H % 128 == 0)


def sequence(cfg, params, xs: jax.Array, hxs: jax.Array, masks: jax.Array):
    """Scan over a [T, B, in] sequence with per-step mask gating.

    hxs: [B, recurrent_N, H] initial state; masks: [T, B, 1].
    Returns (outs [T, B, H], final_hxs [B, recurrent_N, H]).
    """
    if _use_pallas(cfg):
        from onpolicy_tpu.ops import pallas_gru
        return pallas_gru.sequence(cfg, params, xs, hxs, masks)

    # NOTE (round-4 measurement, scripts left in /tmp lore → RESULTS.md):
    # hoisting the input projection out of the scan and/or unrolling
    # LOSES on TPU at training shapes — the scan is bound by a ~1.5 ms
    # per-iteration kernel-launch floor, and the hoist adds a
    # materialized [T·B, 3H] HBM round-trip without removing launches
    # (scan u=1 grad 17.6 ms vs hoist 24-25 ms at [10, 122880, 64]).
    # The launch floor is what the fused Pallas kernel removes (ONE
    # kernel for the whole sequence) — see _use_pallas for the routing.
    dt = cm.compute_dtype(cfg)
    params = cm.cast_floats(params, dt)

    def body(h, xm):
        x, m = xm
        h = h * m[..., None].astype(dt)
        new_h = []
        inp = x.astype(dt)
        for i, layer in enumerate(params["layers"]):
            hi = _cell(layer, inp, h[:, i])
            new_h.append(hi)
            inp = hi
        h = jnp.stack(new_h, axis=1)
        return h, inp

    final_h, outs = jax.lax.scan(body, hxs.astype(dt), (xs, masks))
    outs = cm.layer_norm_apply(params["norm"], outs)
    return outs, final_h.astype(jnp.float32)
