"""MLP feature extractor.

Parity with MLPBase/MLPLayer (`/root/reference/onpolicy/algorithms/utils/
mlp.py`): optional input LayerNorm (feature normalization), then
fc1 + layer_N hidden blocks, each Linear → activation → LayerNorm, with
orthogonal(activation-gain) init.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.models import common as cm


def init(key, cfg, input_dim: int):
    act = "relu" if cfg.use_ReLU else "tanh"
    gain = cm.calculate_gain(act)
    n_layers = 1 + cfg.layer_N
    keys = jax.random.split(key, n_layers)
    params = {}
    if cfg.use_feature_normalization:
        params["feature_norm"] = cm.layer_norm_init(input_dim)
    layers = []
    d_in = input_dim
    for i in range(n_layers):
        layers.append({
            "lin": cm.linear_init(keys[i], d_in, cfg.hidden_size, gain=gain,
                                  use_orthogonal=cfg.use_orthogonal),
            "ln": cm.layer_norm_init(cfg.hidden_size),
        })
        d_in = cfg.hidden_size
    params["layers"] = layers
    return params


def apply(cfg, params, x: jax.Array) -> jax.Array:
    act = cm.activation_fn(cfg.use_ReLU)
    dt = cm.compute_dtype(cfg)
    params = cm.cast_floats(params, dt)
    x = x.astype(dt)
    if cfg.use_feature_normalization:
        x = cm.layer_norm_apply(params["feature_norm"], x)
    for layer in params["layers"]:
        x = cm.layer_norm_apply(layer["ln"], act(cm.linear_apply(layer["lin"], x)))
    return x
