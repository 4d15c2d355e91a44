"""MPE training entry point.

Parity with `/root/reference/onpolicy/scripts/train/train_mpe.py` —
algorithm-name canonicalization, seeding, run-dir layout — minus the
subprocess env pool: envs are the pure-JAX vectorized MPE engine.

Usage:
    python -m onpolicy_tpu.scripts.train_mpe \
        --scenario_name simple_spread --num_agents 3 --num_landmarks 3 \
        --n_rollout_threads 128 --episode_length 25 --num_env_steps 20000000
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import jax

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.utils.run_dir import make_run_dir, MetricsLogger


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    cfg = config_from_args(argv)
    if cfg.share_policy:
        from onpolicy_tpu.runner.shared_runner import SharedRunner as Runner
    else:
        from onpolicy_tpu.runner.separated_runner import SeparatedRunner as Runner

    run_dir = make_run_dir(cfg)
    logger = MetricsLogger(run_dir, cfg)
    if cfg.use_eval:
        from onpolicy_tpu.envs.mpe import make_vec_env
        eval_env = make_vec_env(cfg, n_envs=cfg.n_eval_rollout_threads)
        runner = Runner(cfg, eval_env=eval_env)
    else:
        runner = Runner(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state, history = runner.run(key, log_fn=logger,
                                save_dir=run_dir / "models")
    logger.close()
    return state, history


if __name__ == "__main__":
    main(sys.argv[1:])
