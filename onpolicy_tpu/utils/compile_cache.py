"""Persistent XLA compilation cache.

A fresh process recompiles every program — 1-4 minutes per program
through the remote-TPU (axon) tunnel, paid on every watchdog resume,
eval, and bench run. JAX's persistent compilation cache eliminates it:
measured on this rig, a 63 s first-process compile is a 0.8 s cache hit
in the next process. Enabled by default for every CLI entry point
(train_*/eval_*/bench); opt out with ONPOLICY_TPU_NO_COMPILE_CACHE=1
or pick a location with JAX_COMPILATION_CACHE_DIR. Entries are keyed by
HLO + jaxlib version, so staleness is handled by JAX itself.

No reference analogue (torch eager has no compile step to cache).
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("ONPOLICY_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything — the tunnel makes even small compiles slow
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # cache is an optimization, never a failure mode
