"""Google Research Football training entry point.

Parity with `/root/reference/onpolicy/scripts/train/train_football.py`:
GRF-private flags (--representation, --rewards, --share_reward, smm
dims); envs in the host pool with the 4-tuple protocol (fully observed;
centralized state = obs concat).
"""
from __future__ import annotations

import sys

import jax

from onpolicy_tpu.config import (get_config, Config,
                                 canonicalize_algorithm, apply_wandb_sweep)
from onpolicy_tpu.envs.host_vec import DummyVecEnv, HostVecEnv
from onpolicy_tpu.runner.host_runner import HostSharedRunner
from onpolicy_tpu.utils.run_dir import make_run_dir, MetricsLogger


def parse_args(argv):
    p = get_config()
    p.add_argument("--representation", type=str, default="simple115v2")
    p.add_argument("--rewards", type=str, default="scoring,checkpoints")
    p.add_argument("--smm_width", type=int, default=96)
    p.add_argument("--smm_height", type=int, default=72)
    from onpolicy_tpu.config import _parse_bool
    p.add_argument("--share_reward", nargs="?", const=True, default=True,
                   type=_parse_bool)
    p.add_argument("--eval_deterministic", nargs="?", const=True,
                   default=True, type=_parse_bool)
    # accepted for CLI parity; stored-but-never-consumed in the reference
    # (Football_Env.py:46-47 — no reader anywhere in that repo)
    p.add_argument("--remove_redundancy", nargs="?", const=True,
                   default=False, type=_parse_bool)
    p.add_argument("--zero_feature", nargs="?", const=True,
                   default=False, type=_parse_bool)
    return p.parse_args(argv)


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    ns = parse_args(argv if argv is not None else sys.argv[1:])
    overrides = {k: v for k, v in vars(ns).items()
                 if k in Config.__dataclass_fields__}
    overrides["env_name"] = "Football"
    cfg = canonicalize_algorithm(
        apply_wandb_sweep(Config(**overrides))).validate()

    from onpolicy_tpu.envs.football.football_env import (FootballEnv,
                                                         football_metrics)

    def fn(rank):
        return lambda: FootballEnv(
            scenario_name=cfg.scenario_name, num_agents=cfg.num_agents,
            representation=ns.representation, rewards=ns.rewards,
            share_reward=ns.share_reward, smm_width=ns.smm_width,
            smm_height=ns.smm_height, seed=cfg.seed + rank * 1000)

    Pool = DummyVecEnv if cfg.n_rollout_threads == 1 else HostVecEnv
    envs = Pool([fn(i) for i in range(cfg.n_rollout_threads)],
                protocol="basic")
    runner = HostSharedRunner(cfg, envs, env_metrics=football_metrics())
    run_dir = make_run_dir(cfg)
    logger = MetricsLogger(run_dir, cfg)
    try:
        state, history = runner.run(jax.random.PRNGKey(cfg.seed),
                                    log_fn=logger)
    finally:
        envs.close()
        logger.close()
    return state, history


if __name__ == "__main__":
    main()
