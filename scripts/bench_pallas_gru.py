"""TPU micro-benchmark: fused Pallas GRU vs the lax.scan path.

Shapes model recurrent PPO training minibatches:
  MPE paper config: L=10 chunks, B = T*N*M/L = 25*128*3/10 = 960, H=64
  Hanabi config:    L=10, large B, H=512
Run: PYTHONPATH=/root/repo python scripts/bench_pallas_gru.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from onpolicy_tpu.config import Config
from onpolicy_tpu.models import gru
from onpolicy_tpu.ops import pallas_gru


def _sync(out):
    """Forced device->host transfer: block_until_ready does NOT
    synchronize through the axon tunnel (round-1 lesson — it recorded
    dispatch time, not execution time)."""
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    return float(jax.device_get(
        sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)))


def bench(fn, args, iters=20):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    # --bf16: A/B the bf16 kernel path vs the bf16 scan (round-5; the
    # numerics cross-check loosens to bf16 noise — the two paths round
    # differently by design, tests/test_pallas_gru.py pins accuracy)
    use_bf16 = "--bf16" in sys.argv
    print("backend:", jax.default_backend(), "bf16:", use_bf16)
    shapes = [(10, 960, 54, 64), (10, 4096, 54, 64),
              (10, 2048, 256, 256),
              (10, 2048, 512, 512), (10, 8192, 512, 512)]
    if use_bf16:
        shapes = [(10, 2048, 256, 256), (10, 2048, 512, 512),
                  (10, 8192, 512, 512)]
    for (T, B, D, H) in shapes:
        cfg = Config(hidden_size=H, recurrent_N=1, use_bf16=use_bf16)
        key = jax.random.PRNGKey(0)
        params = gru.init(key, cfg, D)
        xs = jax.random.normal(key, (T, B, D), jnp.float32)
        hxs = jnp.zeros((B, 1, H), jnp.float32)
        masks = (jax.random.uniform(jax.random.fold_in(key, 1),
                                    (T, B, 1)) > 0.2).astype(jnp.float32)

        def loss(params, use_pallas):
            c = cfg.replace(use_pallas_gru=use_pallas)
            outs, hT = gru.sequence(c, params, xs, hxs, masks)
            outs = outs.astype(jnp.float32)
            return jnp.sum(outs * outs) + jnp.sum(hT)

        def loss_f32(params):
            c = cfg.replace(use_pallas_gru=False, use_bf16=False)
            outs, hT = gru.sequence(c, params, xs, hxs, masks)
            return jnp.sum(outs * outs) + jnp.sum(hT)

        fwd_scan = jax.jit(lambda p: loss(p, False))
        fwd_pl = jax.jit(lambda p: loss(p, True))
        g_scan = jax.jit(jax.grad(lambda p: loss(p, False)))
        g_pl = jax.jit(jax.grad(lambda p: loss(p, True)))

        # numerics check on-device
        import numpy as np
        ftol = 3e-2 if use_bf16 else 2e-3
        np.testing.assert_allclose(fwd_pl(params), fwd_scan(params),
                                   rtol=ftol)
        a = jax.tree_util.tree_leaves(g_pl(params))
        b = jax.tree_util.tree_leaves(g_scan(params))
        if use_bf16:
            # the two bf16 paths round differently (the kernel carries
            # h in f32), so compare BOTH to the f32 scan truth: the
            # kernel's error must not exceed the bf16 scan's by more
            # than bf16 noise (on-chip round-5 check: the kernel is the
            # MORE accurate path on every leaf)
            g32 = jax.jit(jax.grad(
                lambda p: loss_f32(p)))(params)
            t = jax.tree_util.tree_leaves(g32)
            for x, y, z in zip(a, b, t):
                sc = max(1.0, float(np.max(np.abs(np.float32(z)))))
                ep = float(np.max(np.abs(np.float32(x)
                                         - np.float32(z)))) / sc
                es = float(np.max(np.abs(np.float32(y)
                                         - np.float32(z)))) / sc
                assert ep <= max(1.5 * es, 0.02), (ep, es)
        else:
            for x, y in zip(a, b):
                # f32: reduction-order differences on the big dW sums
                np.testing.assert_allclose(np.float32(x), np.float32(y),
                                           rtol=2e-2, atol=2e-2)

        t_fs = bench(fwd_scan, (params,))
        t_fp = bench(fwd_pl, (params,))
        t_gs = bench(g_scan, (params,))
        t_gp = bench(g_pl, (params,))
        print(f"[T={T} B={B} D={D} H={H}] fwd scan {t_fs*1e6:8.1f}us "
              f"pallas {t_fp*1e6:8.1f}us ({t_fs/t_fp:4.2f}x) | "
              f"grad scan {t_gs*1e6:8.1f}us pallas {t_gp*1e6:8.1f}us "
              f"({t_gs/t_gp:4.2f}x)")


if __name__ == "__main__":
    main()
