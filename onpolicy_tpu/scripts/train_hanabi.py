"""Hanabi training entry point (turn-based, native batched engine).

Parity with `/root/reference/onpolicy/scripts/train/
train_hanabi_forward.py` (flags --hanabi_name --num_agents; Choose-style
env family) — the env pool is the in-process C++ batched engine.
"""
from __future__ import annotations

import sys

import jax

from onpolicy_tpu.config import (get_config, Config,
                                 canonicalize_algorithm, apply_wandb_sweep)
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner
from onpolicy_tpu.utils.run_dir import make_run_dir, MetricsLogger


def parse_args(argv):
    p = get_config()
    p.add_argument("--hanabi_name", type=str, default="Hanabi-Small")
    return p.parse_args(argv)


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    ns = parse_args(argv if argv is not None else sys.argv[1:])
    overrides = {k: v for k, v in vars(ns).items()
                 if k in Config.__dataclass_fields__}
    overrides["env_name"] = "Hanabi"
    overrides["scenario_name"] = ns.hanabi_name
    cfg = canonicalize_algorithm(
        apply_wandb_sweep(Config(**overrides))).validate()

    eval_env = None
    if cfg.use_eval:
        from onpolicy_tpu.envs.hanabi.hanabi_env import HanabiVecEnv
        eval_env = HanabiVecEnv(
            cfg.scenario_name if cfg.scenario_name.startswith("Hanabi")
            else "Hanabi-Small", cfg.num_agents,
            cfg.n_eval_rollout_threads, seed=cfg.seed * 50000,
            use_obs_instead_of_state=cfg.use_obs_instead_of_state)
    runner = HanabiRunner(cfg, eval_env=eval_env)
    run_dir = make_run_dir(cfg)
    logger = MetricsLogger(run_dir, cfg)
    try:
        state, history = runner.run(jax.random.PRNGKey(cfg.seed),
                                    log_fn=logger,
                                    save_dir=run_dir / "models")
    finally:
        logger.close()
    return state, history, runner


if __name__ == "__main__":
    main()
