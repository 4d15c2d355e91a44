"""Shared layer primitives: initializers, linear, layer-norm.

Initialization parity with the reference (`algorithms/utils/util.py:7-13`,
`mlp.py:12-16`): orthogonal (or xavier-uniform) weights with an
activation-dependent gain, zero biases. Params are plain nested dicts —
transparent pytrees that vmap/pjit cleanly (e.g. stacked per-agent params
for separated policies).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch nn.LayerNorm default


def calculate_gain(activation: str) -> float:
    if activation == "relu":
        return math.sqrt(2.0)
    if activation == "tanh":
        return 5.0 / 3.0
    if activation in ("linear", "sigmoid"):
        return 1.0
    raise ValueError(activation)


def orthogonal(key, shape, gain=1.0, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, dtype)


def xavier_uniform(key, shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def linear_init(key, in_dim: int, out_dim: int, *, gain: float = 1.0,
                use_orthogonal: bool = True, dtype=jnp.float32):
    """Weight stored [in, out] (JAX convention; torch stores [out, in])."""
    init_fn = orthogonal if use_orthogonal else xavier_uniform
    # torch initializes the [out, in] matrix; orthogonal of the transpose
    # has the same distribution, so [in, out] directly is equivalent.
    w = init_fn(key, (in_dim, out_dim), gain, dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * p["scale"] + p["bias"]


def activation_fn(use_relu: bool):
    return jax.nn.relu if use_relu else jnp.tanh


def compute_dtype(cfg):
    """bf16 mixed-precision compute (cfg.use_bf16): matmuls/LN run in
    bfloat16, params and distribution/loss math stay fp32."""
    return jnp.bfloat16 if getattr(cfg, "use_bf16", False) else jnp.float32


def cast_floats(tree, dtype):
    """Cast float leaves of a param subtree to the compute dtype (no-op
    for fp32). Integer leaves pass through."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
