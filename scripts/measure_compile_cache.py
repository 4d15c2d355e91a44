"""Two-process compile-cache measurement (round-4 VERDICT weak 3: the
'63 s -> 0.8 s' claim lived only in a docstring).

Runs the SAME jit program in two child processes sharing a fresh cache
dir: process 1 compiles cold and populates the cache; process 2 must
hit it. Prints both first-compile wall times. The program is a
mid-sized train-step-shaped computation (matmuls + scan) so the compile
is nontrivial.

Usage: python scripts/measure_compile_cache.py [--cpu]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import os, sys, time, json
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, r"%(repo)s")
from onpolicy_tpu.utils import compile_cache
ok = compile_cache.enable(sys.argv[1])
import jax.numpy as jnp

def step(params, xs):
    def body(c, x):
        h = jnp.tanh(x @ params["w1"] + c @ params["u"] + params["b"])
        return h, h

    h0 = jnp.zeros((xs.shape[1], params["u"].shape[0]), jnp.float32)
    h, outs = jax.lax.scan(body, h0, xs)
    v = outs @ params["w2"]
    return jnp.sum(v ** 2) + jnp.sum(h)

g = jax.jit(jax.grad(step))
key = jax.random.PRNGKey(0)
H = 256
params = {
    "w1": jax.random.normal(key, (H, H)) * 0.02,
    "u": jax.random.normal(key, (H, H)) * 0.02,
    "w2": jax.random.normal(key, (H, 1)) * 0.02,
    "b": jnp.zeros((H,)),
}
xs = jax.random.normal(key, (16, 1024, H))
t0 = time.perf_counter()
out = g(params, xs)
float(jax.device_get(jnp.sum(out["w1"])))
dt = time.perf_counter() - t0
print(json.dumps({"cache_enabled": ok, "first_call_s": round(dt, 3)}))
"""


def main():
    cpu = ["--cpu"] if "--cpu" in sys.argv else []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = CHILD % {"repo": repo}
    with tempfile.TemporaryDirectory() as td:
        cache = os.path.join(td, "cache")
        script = os.path.join(td, "child.py")
        with open(script, "w") as f:
            f.write(src)
        rows = []
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            out = subprocess.run(
                [sys.executable, script, cache] + cpu,
                capture_output=True, text=True, timeout=560)
            wall = time.perf_counter() - t0
            line = out.stdout.strip().splitlines()[-1] if out.stdout else "{}"
            row = json.loads(line)
            row.update({"phase": tag, "process_wall_s": round(wall, 2)})
            rows.append(row)
            print(row, flush=True)
        speedup = rows[0]["first_call_s"] / max(rows[1]["first_call_s"],
                                               1e-9)
        print(f"cold {rows[0]['first_call_s']}s -> warm "
              f"{rows[1]['first_call_s']}s ({speedup:.1f}x)")


if __name__ == "__main__":
    main()
