"""Fused Pallas TPU kernel for the sequence-mode mask-gated GRU.

This is the hot op of recurrent PPO training: `evaluate_actions` runs the
GRU over [L = data_chunk_length, B = huge] minibatches every ppo update
(the reference offloads this to cuDNN with mask segmentation,
`/root/reference/onpolicy/algorithms/utils/rnn.py:30-77`; our baseline
path is the branch-free `lax.scan` in `models/gru.py`).

Kernel design (TPU-first):

  * The input-side projection `gi = x @ W_ih + b_ih` has no sequential
    dependency, so it is computed OUTSIDE the kernel as one big
    [T·B, in] × [in, 3H] MXU matmul over all timesteps at once.
  * Only the irreducibly sequential hidden-side recurrence runs in the
    kernel: grid = (B tiles, T); the hidden state lives in a VMEM
    scratch buffer carried across the time dimension of the grid (TPU
    grids iterate sequentially on a core), so h never round-trips HBM.
    Per step: one [B_t, H] × [H, H] matmul per gate (MXU) + the gate
    nonlinearities (VPU), fused in one program.
  * Rematerialized backward: the forward kernel writes ONLY the hidden
    sequence (no gate residuals). The backward kernel recomputes
    r/z/n from the saved input-side pre-activations plus the hidden-side
    matmuls — 2 extra [B_t, H] × [H, H] matmuls per step in exchange for
    6 fewer HBM stream passes (3 residual writes + 3 reads). On TPU the
    recurrence is HBM-bandwidth-bound, so FLOPs-for-bytes is the right
    trade. dW_hh / db_hh accumulate in VMEM scratch across the whole
    grid and are written once at the final program.
  * Weights are passed per-gate ([H, H] each) so H = 64-class hidden
    sizes avoid lane-misaligned slicing of a packed [H, 3H] matrix.

Numerics are float32 with the same gate order and h·mask gating as the
scan path; equivalence (forward + all gradients) is asserted in
tests/test_pallas_gru.py. On non-TPU backends the kernel runs in
interpreter mode (tests) — production CPU use should keep the scan path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _b_tile(H: int, streams: int = 9, itemsize: int = 4) -> int:
    """Batch-tile rows per grid program: as many rows as keep the
    per-program double-buffered sequence streams + weight-class blocks
    within a ~12MB VMEM budget (16MB/core minus headroom), floor 128.

    The weight term budgets the BACKWARD's worst case — hidden weights
    in (3H²) + dW output accumulators (3H², VMEM-resident across the
    whole grid via their constant index map) + biases — which is what
    previously OOMed at H=512 with the 256-row floor (round-3 item:
    256×9 streams + separate dW scratch ≈ 19.5M > 16M).

    `itemsize` is the SEQUENCE-stream element size (2 under the bf16
    path — weights/accumulators stay f32)."""
    budget = 12 * 1024 * 1024
    weights = 6 * H * H * 4 + 16 * H * 4
    per_row = streams * max(H, 128) * itemsize * 2   # double-buffered
    rows = max(128, (budget - weights) // per_row)
    return min(1024, (rows // 128) * 128)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _dotT_rhs(a, w):
    """a @ w.T : contract last dims. a [B,H], w [H,H] -> [B,H]."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dotT_lhs(a, b):
    """a.T @ b : contract leading (batch) dims. a [B,H], b [B,H] -> [H,H]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gates(gir, giz, gin, hm, wr_ref, wz_ref, wn_ref, bhh_ref):
    # sequence streams may arrive bf16 (the bf16 path halves their
    # HBM/VMEM traffic); gate math always accumulates in f32
    f32 = jnp.float32
    ghr = _dot(hm, wr_ref[:]) + bhh_ref[0:1, :]
    ghz = _dot(hm, wz_ref[:]) + bhh_ref[1:2, :]
    ghn = _dot(hm, wn_ref[:]) + bhh_ref[2:3, :]
    r = jax.nn.sigmoid(gir.astype(f32) + ghr)
    z = jax.nn.sigmoid(giz.astype(f32) + ghz)
    n = jnp.tanh(gin.astype(f32) + r * ghn)
    return r, z, n, ghn


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(gir_ref, giz_ref, gin_ref, m_ref, h0_ref,
                wr_ref, wz_ref, wn_ref, bhh_ref,
                oh_ref, hT_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    m = m_ref[0]                                  # [B, 1]
    hm = h_scr[:] * m
    r, z, n, _ = _gates(gir_ref[0], giz_ref[0], gin_ref[0], hm,
                        wr_ref, wz_ref, wn_ref, bhh_ref)
    h = (1.0 - z) * n + z * hm
    h_scr[:] = h
    oh_ref[0] = h.astype(oh_ref.dtype)
    hT_ref[:] = h


def _fwd_call(gir, giz, gin, h0, masks, wr, wz, wn, bhh):
    T, B, H = gir.shape
    sd = gir.dtype                      # sequence-stream dtype (f32|bf16)
    # SAME tile as `sequence`'s padding and `_bwd_call` — round-3 bug:
    # the fwd previously picked a streams=5 tile that disagreed with
    # the streams=9 padding tile at H=256 (1024 vs 512), making
    # nb = B // B_TILE zero/truncated so the kernel never wrote (the
    # compiled-mode divergence found in the on-chip A/B)
    B_TILE = _b_tile(H, itemsize=sd.itemsize)
    assert B % B_TILE == 0, (B, B_TILE)
    nb = B // B_TILE
    t_spec = pl.BlockSpec((1, B_TILE, H), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, B_TILE, 1), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((B_TILE, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((3, H), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(nb, T),
        in_specs=[t_spec, t_spec, t_spec, m_spec, b_spec,
                  w_spec, w_spec, w_spec, bias_spec],
        out_specs=(t_spec, b_spec),
        out_shape=(jax.ShapeDtypeStruct((T, B, H), sd),
                   jax.ShapeDtypeStruct((B, H), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B_TILE, H), jnp.float32)],
        interpret=_interpret(),
    )(gir, giz, gin, masks, h0, wr, wz, wn, bhh)


# ---------------------------------------------------------------------------
# backward (rematerializes the gates from gi + hprev)
# ---------------------------------------------------------------------------

def _bwd_kernel(gir_ref, giz_ref, gin_ref, hp_ref, m_ref, do_ref, dhT_ref,
                wr_ref, wz_ref, wn_ref, bhh_ref,
                dgir_ref, dgiz_ref, dgin_ref, dh0_ref,
                dwr_ref, dwz_ref, dwn_ref, dbhh_ref,
                dh_scr):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    # dW/db accumulate DIRECTLY into the output refs: their index maps
    # are constant over the grid so the blocks stay VMEM-resident for
    # the whole kernel and flush to HBM once at the end — same effect as
    # a scratch accumulator but without a second 3H² VMEM copy (the
    # H=512 OOM headroom).
    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dwr_ref[:] = jnp.zeros_like(dwr_ref)
        dwz_ref[:] = jnp.zeros_like(dwz_ref)
        dwn_ref[:] = jnp.zeros_like(dwn_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhT_ref[:]

    m = m_ref[0]                                  # [B, 1]
    hm = hp_ref[0] * m
    r, z, n, ghn = _gates(gir_ref[0], giz_ref[0], gin_ref[0], hm,
                          wr_ref, wz_ref, wn_ref, bhh_ref)

    dh = dh_scr[:] + do_ref[0]
    dz_pre = dh * (hm - n) * z * (1.0 - z)
    dn_pre = dh * (1.0 - z) * (1.0 - n * n)
    dr_pre = dn_pre * ghn * r * (1.0 - r)
    dghn = dn_pre * r

    d_hm = dh * z + _dotT_rhs(dr_pre, wr_ref[:]) \
        + _dotT_rhs(dz_pre, wz_ref[:]) + _dotT_rhs(dghn, wn_ref[:])
    dh_scr[:] = d_hm * m

    dgir_ref[0] = dr_pre.astype(dgir_ref.dtype)
    dgiz_ref[0] = dz_pre.astype(dgiz_ref.dtype)
    dgin_ref[0] = dn_pre.astype(dgin_ref.dtype)

    dwr_ref[:] = dwr_ref[:] + _dotT_lhs(hm, dr_pre)
    dwz_ref[:] = dwz_ref[:] + _dotT_lhs(hm, dz_pre)
    dwn_ref[:] = dwn_ref[:] + _dotT_lhs(hm, dghn)
    dbhh_ref[0:1, :] = dbhh_ref[0:1, :] + jnp.sum(dr_pre, axis=0,
                                                  keepdims=True)
    dbhh_ref[1:2, :] = dbhh_ref[1:2, :] + jnp.sum(dz_pre, axis=0,
                                                  keepdims=True)
    dbhh_ref[2:3, :] = dbhh_ref[2:3, :] + jnp.sum(dghn, axis=0,
                                                  keepdims=True)

    @pl.when(t == nt - 1)
    def _():
        dh0_ref[:] = dh_scr[:]


def _bwd_call(gir, giz, gin, hprev, masks, douts, dhT, wr, wz, wn, bhh):
    T, B, H = gir.shape
    sd = gir.dtype
    B_TILE = _b_tile(H, itemsize=sd.itemsize)   # 6 seq in + 3 seq out
    assert B % B_TILE == 0, (B, B_TILE)
    nb = B // B_TILE
    # reverse-time index maps: grid step t reads actual time T-1-t
    rt = pl.BlockSpec((1, B_TILE, H), lambda b, t: (T - 1 - t, b, 0),
                      memory_space=pltpu.VMEM)
    rm = pl.BlockSpec((1, B_TILE, 1), lambda b, t: (T - 1 - t, b, 0),
                      memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((B_TILE, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((3, H), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    seq = jax.ShapeDtypeStruct((T, B, H), sd)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(nb, T),
        in_specs=[rt, rt, rt, rt, rm, rt, b_spec,
                  w_spec, w_spec, w_spec, bias_spec],
        out_specs=(rt, rt, rt, b_spec, w_spec, w_spec, w_spec, bias_spec),
        out_shape=(seq, seq, seq,
                   jax.ShapeDtypeStruct((B, H), jnp.float32),
                   jax.ShapeDtypeStruct((H, H), jnp.float32),
                   jax.ShapeDtypeStruct((H, H), jnp.float32),
                   jax.ShapeDtypeStruct((H, H), jnp.float32),
                   jax.ShapeDtypeStruct((3, H), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B_TILE, H), jnp.float32)],
        interpret=_interpret(),
    )(gir, giz, gin, hprev, masks, douts, dhT, wr, wz, wn, bhh)


# ---------------------------------------------------------------------------
# differentiable per-layer sequence op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gru_layer_sequence(gir, giz, gin, h0, masks, wr, wz, wn, bhh):
    """One GRU layer over a padded [T, B, H] sequence.

    gir/giz/gin: input-side gate pre-activations (x @ W_ih + b_ih, split
    per gate). h0 [B, H]; masks [T, B, 1]; wr/wz/wn [H, H] hidden-side
    weights per gate; bhh [3, H] hidden-side biases (r, z, n rows).
    B must be a multiple of the batch tile. Returns (outs, hT).
    """
    outs, hT = _fwd_call(gir, giz, gin, h0, masks, wr, wz, wn, bhh)
    return outs, hT


def _layer_fwd(gir, giz, gin, h0, masks, wr, wz, wn, bhh):
    outs, hT = _fwd_call(gir, giz, gin, h0, masks, wr, wz, wn, bhh)
    return (outs, hT), (gir, giz, gin, outs, h0, masks, wr, wz, wn, bhh)


def _layer_bwd(res, cts):
    gir, giz, gin, outs, h0, masks, wr, wz, wn, bhh = res
    douts, dhT = cts
    hprev = jnp.concatenate([h0[None].astype(outs.dtype), outs[:-1]],
                            axis=0)
    dgir, dgiz, dgin, dh0, dwr, dwz, dwn, dbhh = _bwd_call(
        gir, giz, gin, hprev, masks, douts, dhT, wr, wz, wn, bhh)
    return (dgir, dgiz, dgin, dh0, jnp.zeros_like(masks),
            dwr, dwz, dwn, dbhh)


gru_layer_sequence.defvjp(_layer_fwd, _layer_bwd)


# ---------------------------------------------------------------------------
# public API — drop-in for models.gru.sequence
# ---------------------------------------------------------------------------

def _pad_b(x, B_pad, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, B_pad - x.shape[axis])
    return jnp.pad(x, pad) if B_pad != x.shape[axis] else x


def sequence(cfg, params, xs: jax.Array, hxs: jax.Array, masks: jax.Array):
    """Pallas-fused equivalent of models.gru.sequence.

    xs [T, B, in]; hxs [B, recurrent_N, H]; masks [T, B, 1].
    Returns (outs [T, B, H] after LayerNorm, final hxs).
    """
    from onpolicy_tpu.models import common as cm

    T, B, _ = xs.shape
    H = cfg.hidden_size
    # bf16 path (cfg.use_bf16): the big [T, B, H] sequence streams
    # (gi in, outs out, and their cotangents) move in bf16 — they are
    # the HBM-bandwidth term — while the hidden scratch, weights, and
    # dW/db accumulators stay f32 (a bf16 grid-accumulated dW would
    # lose precision). Gate math accumulates in f32 either way.
    sd = cm.compute_dtype(cfg)
    bt = _b_tile(H, itemsize=jnp.dtype(sd).itemsize)
    B_pad = -(-B // bt) * bt
    m = _pad_b(masks.astype(jnp.float32), B_pad, 1)
    inp = _pad_b(xs.astype(sd), B_pad, 1)
    h0s = _pad_b(hxs.astype(jnp.float32), B_pad, 0)
    finals = []
    for i, layer in enumerate(params["layers"]):
        # three direct matmuls (not one packed [in, 3H] matmul sliced
        # after): slicing a materialized [T, B, 3H] costs two full HBM
        # passes over it, which dominates at large H
        flat = inp.reshape(T * B_pad, -1)
        wi = layer["w_ih"].astype(sd)
        bi = layer["b_ih"].astype(sd)
        gir = (flat @ wi[:, :H] + bi[:H]).reshape(T, B_pad, H)
        giz = (flat @ wi[:, H:2 * H] + bi[H:2 * H]).reshape(T, B_pad, H)
        gin = (flat @ wi[:, 2 * H:] + bi[2 * H:]).reshape(T, B_pad, H)
        w = layer["w_hh"]
        wr, wz, wn = w[:, :H], w[:, H:2 * H], w[:, 2 * H:]
        bhh = layer["b_hh"].reshape(3, H)
        outs, hT = gru_layer_sequence(gir, giz, gin, h0s[:, i], m,
                                      wr, wz, wn, bhh)
        finals.append(hT[:B])
        inp = outs
    out = cm.layer_norm_apply(cm.cast_floats(params["norm"], sd),
                              inp[:, :B])
    return out, jnp.stack(finals, axis=1)
