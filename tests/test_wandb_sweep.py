"""wandb sweep rebinding parity (`train_smac.py:186` in the reference:
`all_args = wandb.config` lets a sweep override the CLI flags).

`apply_wandb_sweep` must: no-op without use_wandb / without an active
run; override flags (applied BEFORE canonicalize+validate so a sweep
can flip algorithm_name); and raise on unknown sweep keys (the strict-
parser contract). Driven with a stubbed `wandb` module.
"""
from __future__ import annotations

import sys
import types

import pytest

from onpolicy_tpu.config import Config, apply_wandb_sweep, config_from_args


def _stub_wandb(monkeypatch, config=None):
    w = types.ModuleType("wandb")
    w.run = None if config is None else types.SimpleNamespace(config=config)
    w.init = lambda *a, **k: w.run
    monkeypatch.setitem(sys.modules, "wandb", w)
    return w


def test_noop_without_use_wandb(monkeypatch):
    _stub_wandb(monkeypatch, {"lr": 1e-3})
    cfg = Config(use_wandb=False, lr=7e-4)
    assert apply_wandb_sweep(cfg).lr == 7e-4


def test_noop_without_active_run(monkeypatch):
    _stub_wandb(monkeypatch, None)
    monkeypatch.delenv("WANDB_SWEEP_ID", raising=False)
    cfg = Config(use_wandb=True, lr=7e-4)
    assert apply_wandb_sweep(cfg).lr == 7e-4


def test_sweep_overrides_flags(monkeypatch):
    _stub_wandb(monkeypatch, {"lr": 1e-3, "ppo_epoch": 5,
                              "entropy_coef": 0.02})
    cfg = Config(use_wandb=True, lr=7e-4, ppo_epoch=15)
    out = apply_wandb_sweep(cfg)
    assert out.lr == 1e-3 and out.ppo_epoch == 5
    assert out.entropy_coef == 0.02


def test_unknown_sweep_key_raises(monkeypatch):
    _stub_wandb(monkeypatch, {"learning_rate_typo": 1e-3})
    with pytest.raises(ValueError, match="unknown wandb sweep"):
        apply_wandb_sweep(Config(use_wandb=True))


def test_applied_before_canonicalize(monkeypatch):
    """A sweep flipping algorithm_name must reach canonicalization —
    rmappo from the sweep turns the recurrent policy on even though the
    CLI said mappo."""
    _stub_wandb(monkeypatch, {"algorithm_name": "rmappo"})
    cfg = config_from_args(["--algorithm_name", "mappo", "--use_wandb"])
    assert cfg.algorithm_name == "rmappo"
    assert cfg.use_recurrent_policy


def test_sweep_init_via_env(monkeypatch):
    """WANDB_SWEEP_ID with no active run triggers wandb.init()."""
    w = types.ModuleType("wandb")
    w.run = None

    def init(*a, **k):
        w.run = types.SimpleNamespace(config={"seed": 42})
        return w.run

    w.init = init
    monkeypatch.setitem(sys.modules, "wandb", w)
    monkeypatch.setenv("WANDB_SWEEP_ID", "abc123")
    out = apply_wandb_sweep(Config(use_wandb=True, seed=1))
    assert out.seed == 42


def test_yaml_native_wrong_typed_numerics_coerced(monkeypatch):
    """ADVICE round 4: a yaml-native float for an int field (64.0 for
    hidden_size) and scientific-notation strings for int fields ('1e5'
    for num_env_steps) must coerce to real ints, not pass through or
    raise."""
    _stub_wandb(monkeypatch, {"hidden_size": 64.0, "num_env_steps": "1e5",
                              "lr": "5e-4", "ppo_epoch": 10.0})
    cfg = apply_wandb_sweep(Config(use_wandb=True))
    assert cfg.hidden_size == 64 and isinstance(cfg.hidden_size, int)
    assert cfg.num_env_steps == 100000 \
        and isinstance(cfg.num_env_steps, int)
    assert cfg.lr == pytest.approx(5e-4) and isinstance(cfg.lr, float)
    assert cfg.ppo_epoch == 10 and isinstance(cfg.ppo_epoch, int)
