"""Shared exact-resume protocol for the host-ingestion runners.

One implementation of the checkpoint round-trip both `HostSharedRunner`
and `HostSeparatedRunner` use (review r4: the two ~25-line blocks had
drifted-apart risk): episode counter, RNG key, and the staging carry
(obs/rnn/masks numpy blocks) persist through the checkpoint's extra
file — beyond the reference's weights-only restore
(`base_runner.py:143-162`). External env state itself cannot be
checkpointed (SC2/GRF are live processes): the pool is freshly reset
and the restored carry keeps every policy/trainer input identical.
"""
from __future__ import annotations

import numpy as np

from onpolicy_tpu.utils import checkpoint as ckpt_lib


def restore_run_state(cfg, start: dict, restore_meta, key):
    """→ (start, key, start_episode). `restore_meta` is the
    (step, key) pair captured when the weights were restored, or None
    for a fresh run."""
    if restore_meta is None:
        return start, key, 0
    step, rkey = restore_meta
    template = {k: v for k, v in start.items() if v is not None}
    extra = ckpt_lib.restore_extra(cfg.model_dir, template)
    if extra is not None:
        start = dict(start)
        start.update({k: np.asarray(v) for k, v in extra.items()})
    if rkey is not None:
        key = rkey
    return start, key, step + 1


def save_run_state(save_dir, state, ep: int, key, start: dict):
    """Full-state checkpoint + the staging carry as numpy extras.
    Call AFTER any eval split so the saved key reproduces the
    uninterrupted RNG stream on resume."""
    ckpt_lib.save(save_dir, state, step=ep, key=key,
                  extra={k: np.asarray(v) for k, v in start.items()
                         if v is not None})
