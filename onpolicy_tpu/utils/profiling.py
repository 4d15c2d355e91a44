"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock FPS prints (SURVEY
§5.1). Here: `jax.profiler` trace capture around a chosen episode
(viewable in TensorBoard/Perfetto) plus a lightweight phase timer whose
results flow into the metrics rows.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(profile_dir, enabled: bool = True):
    """Capture a jax.profiler trace into `profile_dir` for the duration
    of the with-block."""
    if not enabled or not profile_dir:
        yield
        return
    Path(profile_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; `summary()` returns
    {phase: seconds} and resets."""

    def __init__(self):
        self._acc = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0

    def summary(self, reset: bool = True) -> dict:
        out = {f"time/{k}": round(v, 4) for k, v in self._acc.items()}
        if reset:
            self._acc.clear()
        return out
