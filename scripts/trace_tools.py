"""Shared helpers for on-chip profiling scripts: capture a
jax.profiler trace and aggregate per-op device time from the
trace.json.gz (works through the axon tunnel — the round-5 Hanabi
kernel hunt validated this path; see docs/PROFILE_HANABI.md)."""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def capture(fn, *args, trace_dir="/tmp/jax_trace", sync=None):
    """Run `fn(*args)` once under jax.profiler tracing; returns the
    trace directory's newest trace.json.gz path."""
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    out = fn(*args)
    if sync is not None:
        sync(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    return paths[-1]


def aggregate(trace_path, drop_prefixes=("while",)):
    """→ (per-op Counter of device-us, per-op event counts, total_us)
    over the 'XLA Ops' thread of the TPU device process, excluding
    wrapper rows (the while op double-counts its body)."""
    with gzip.open(trace_path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "tpu" in n}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in ev if e.get("ph") == "M"
            and e.get("name") == "thread_name"}
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        if tids.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        name = e.get("name", "")
        if any(name.startswith(p) for p in drop_prefixes):
            continue
        agg[name] += e.get("dur", 0)
        cnt[name] += 1
    return agg, cnt, sum(agg.values())


def attribute_sources(jitted, args, names):
    """Map op names → (source_file:line, shape) using the compiled HLO
    text of `jitted.lower(*args)`."""
    txt = jitted.lower(*args).compile().as_text()
    out = {}
    import re
    for name in names:
        m = re.search(rf"%{re.escape(name)} = (\S+) [^\n]*?"
                      rf"source_file=\"([^\"]+)\" source_line=(\d+)", txt)
        if m:
            out[name] = (f"{os.path.basename(m.group(2))}:{m.group(3)}",
                         m.group(1).split("{")[0])
    return out
