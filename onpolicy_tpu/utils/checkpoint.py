"""Full-state checkpointing.

The reference saves only actor/critic weight state-dicts — no optimizer
state, buffer, RNG, or step counter; resume restarts from step 0
(`base_runner.py:143-162`, SURVEY §5.4). Here the ENTIRE TrainState
pytree (params, both optimizer states, value-normalizer stats) plus
step/RNG metadata round-trips through flax's msgpack serialization, so
training resumes exactly.

Layout: <dir>/ckpt_<step>.msgpack + latest.txt pointer.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save(ckpt_dir, state: Any, step: int = 0, key=None,
         metadata: Optional[dict] = None, extra: Any = None) -> Path:
    """`extra` (e.g. the rollout carry with on-device env states) goes to
    a sibling file so existing weights-only consumers stay compatible."""
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    payload = {
        "state": jax.device_get(state),
        "step": step,
        "key": None if key is None else np.asarray(key),
    }
    path = d / f"ckpt_{step}.msgpack"
    path.write_bytes(serialization.to_bytes(payload))
    if extra is not None:
        (d / f"ckpt_{step}.extra.msgpack").write_bytes(
            serialization.to_bytes(jax.device_get(extra)))
    (d / "latest.txt").write_text(path.name)
    if metadata:
        (d / f"ckpt_{step}.meta.json").write_text(json.dumps(metadata))
    return path


def latest_path(ckpt_dir) -> Optional[Path]:
    d = Path(ckpt_dir)
    pointer = d / "latest.txt"
    if pointer.exists():
        p = d / pointer.read_text().strip()
        return p if p.exists() else None
    cands = sorted((p for p in d.glob("ckpt_*.msgpack")
                    if p.stem.split("_")[1].isdigit()),
                   key=lambda p: int(p.stem.split("_")[1]))
    return cands[-1] if cands else None


def restore(ckpt_dir, target_state: Any, key=None
            ) -> Tuple[Any, int, Any]:
    """→ (state, step, key). `target_state` provides the pytree structure
    (an initialized TrainState)."""
    path = Path(ckpt_dir)
    if path.is_dir():
        path = latest_path(path)
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    template = {
        "state": jax.device_get(target_state),
        "step": 0,
        "key": None if key is None else np.asarray(key),
    }
    payload = serialization.from_bytes(template, path.read_bytes())
    restored_key = payload["key"]
    if restored_key is not None:
        restored_key = jax.numpy.asarray(restored_key)
    return payload["state"], int(payload["step"]), restored_key


def restore_extra(ckpt_dir, template: Any) -> Optional[Any]:
    """Restore the sibling `extra` pytree saved next to the latest
    checkpoint (None when the checkpoint was weights-only)."""
    path = Path(ckpt_dir)
    if path.is_dir():
        path = latest_path(path)
        if path is None:
            return None
    extra_path = path.with_suffix("").with_suffix(".extra.msgpack") \
        if path.name.endswith(".extra.msgpack") else \
        path.parent / (path.stem + ".extra.msgpack")
    if not extra_path.exists():
        return None
    return serialization.from_bytes(jax.device_get(template),
                                    extra_path.read_bytes())


def load_metadata(ckpt_dir) -> Optional[dict]:
    """Metadata dict saved next to the latest checkpoint (None if the
    checkpoint carries none)."""
    path = Path(ckpt_dir)
    if path.is_dir():
        path = latest_path(path)
        if path is None:
            return None
    meta_path = path.parent / (path.stem + ".meta.json")
    if not meta_path.exists():
        return None
    return json.loads(meta_path.read_text())
