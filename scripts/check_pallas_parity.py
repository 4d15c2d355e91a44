"""On-chip parity check (round-4 gate): max abs diff of the Pallas GRU
vs the scan path — forward outputs, final hidden, and every param grad —
at the verified widths incl. the paper Hanabi width H=512."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from onpolicy_tpu.config import Config
from onpolicy_tpu.models import gru

print("backend:", jax.default_backend())
for (T, B, D, H) in [(10, 2048, 256, 256), (10, 2048, 512, 512),
                     (10, 8192, 512, 512)]:
    cfg = Config(hidden_size=H, recurrent_N=1)
    key = jax.random.PRNGKey(0)
    params = gru.init(key, cfg, D)
    xs = jax.random.normal(key, (T, B, D), jnp.float32)
    hxs = jax.random.normal(jax.random.fold_in(key, 7), (B, 1, H),
                            jnp.float32) * 0.1
    masks = (jax.random.uniform(jax.random.fold_in(key, 1),
                                (T, B, 1)) > 0.2).astype(jnp.float32)

    def fwd(params, use):
        c = cfg.replace(use_pallas_gru=use)
        return gru.sequence(c, params, xs, hxs, masks)

    o_s, h_s = jax.jit(lambda p: fwd(p, False))(params)
    o_p, h_p = jax.jit(lambda p: fwd(p, True))(params)
    d_o = float(jnp.max(jnp.abs(o_s - o_p)))
    d_h = float(jnp.max(jnp.abs(h_s - h_p)))

    def loss(params, use):
        outs, hT = fwd(params, use)
        # sin probe: couples every element with O(1) weights
        return jnp.sum(jnp.sin(outs)) + jnp.sum(jnp.sin(hT))

    g_s = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_p = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    gmax = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        ref = float(jnp.max(jnp.abs(a)))
        gmax = max(gmax, float(jnp.max(jnp.abs(a - b))) / max(ref, 1e-9))
    print(f"[T={T} B={B} H={H}] fwd maxdiff {d_o:.3e}  hT maxdiff {d_h:.3e}"
          f"  grad max rel-maxdiff {gmax:.3e}")
