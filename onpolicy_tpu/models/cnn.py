"""CNN feature extractor for image observations.

Parity with CNNBase/CNNLayer (`/root/reference/onpolicy/algorithms/utils/
cnn.py`): input scaled /255, one Conv(C → hidden/2, k=3, s=1, VALID),
flatten, two Linear(… → hidden) blocks, all with activation and
orthogonal(activation-gain) init.

Obs layout here is CHW at the API boundary (matching the reference's
space shape); internally we convert to NHWC, the TPU-native conv layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm

KERNEL = 3
STRIDE = 1


def init(key, cfg, obs_shape):
    c, w, h = obs_shape
    act = "relu" if cfg.use_ReLU else "tanh"
    gain = cm.calculate_gain(act)
    hid = cfg.hidden_size
    k0, k1, k2 = jax.random.split(key, 3)
    out_w = (w - KERNEL) // STRIDE + 1
    out_h = (h - KERNEL) // STRIDE + 1
    flat = (hid // 2) * out_w * out_h
    init_fn = cm.orthogonal if cfg.use_orthogonal else cm.xavier_uniform
    # Conv kernel HWIO; orthogonal over the flattened (HWI, O) matrix.
    kern = init_fn(k0, (KERNEL * KERNEL * c, hid // 2), gain).reshape(
        KERNEL, KERNEL, c, hid // 2)
    return {
        "conv": {"w": kern, "b": jnp.zeros((hid // 2,), jnp.float32)},
        "fc1": cm.linear_init(k1, flat, hid, gain=gain,
                              use_orthogonal=cfg.use_orthogonal),
        "fc2": cm.linear_init(k2, hid, hid, gain=gain,
                              use_orthogonal=cfg.use_orthogonal),
    }


def apply(cfg, params, x: jax.Array) -> jax.Array:
    """x: [B, C, W, H] → [B, hidden]."""
    act = cm.activation_fn(cfg.use_ReLU)
    dt = cm.compute_dtype(cfg)
    params = cm.cast_floats(params, dt)
    x = (x.astype(jnp.float32) / 255.0).astype(dt)
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
    y = jax.lax.conv_general_dilated(
        x, params["conv"]["w"], window_strides=(STRIDE, STRIDE),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = act(y + params["conv"]["b"])
    y = y.reshape(y.shape[0], -1)
    y = act(cm.linear_apply(params["fc1"], y))
    y = act(cm.linear_apply(params["fc2"], y))
    return y
