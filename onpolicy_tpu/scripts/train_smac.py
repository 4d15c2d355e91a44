"""SMAC / SMACv2 training entry point.

Parity with `/root/reference/onpolicy/scripts/train/train_smac.py`:
env ids StarCraft2 / StarCraft2v2 (and aliases SMAC / SMACv2),
num_agents from the map registry, SMACv2 capability-distribution
builder, win-rate metrics. Envs run in the shared-memory host pool
feeding the jitted trainer.

    python -m onpolicy_tpu.scripts.train_smac --env_name StarCraft2 \
        --map_name 3s5z --algorithm_name rmappo --n_rollout_threads 8 \
        --episode_length 400 --num_env_steps 10000000
"""
from __future__ import annotations

import sys
from types import SimpleNamespace

import jax

from onpolicy_tpu.config import (get_config, Config,
                                 canonicalize_algorithm, apply_wandb_sweep)
from onpolicy_tpu.envs.host_vec import DummyVecEnv, HostVecEnv
from onpolicy_tpu.envs.starcraft2.smac_maps import get_map_params
from onpolicy_tpu.runner.host_runner import HostSharedRunner
from onpolicy_tpu.utils.run_dir import make_run_dir, MetricsLogger


def parse_args(argv):
    p = get_config()
    p.add_argument("--map_name", type=str, default="3s5z")
    p.add_argument("--units", type=str, default="10v10",
                   help="SMACv2 ally-v-enemy unit counts, e.g. 10v11")
    from onpolicy_tpu.config import _parse_bool
    p.add_argument("--add_center_xy", nargs="?", const=True, default=True,
                   type=_parse_bool)
    p.add_argument("--use_state_agent", nargs="?", const=True, default=True,
                   type=_parse_bool)
    p.add_argument("--use_mustalive", nargs="?", const=True, default=True,
                   type=_parse_bool)
    # EP-state ablation blocks (reference train_smac.py:112-118)
    for f in ("add_move_state", "add_local_obs", "add_distance_state",
              "add_xy_state", "add_visible_state", "add_enemy_action_state",
              "add_agent_id"):
        p.add_argument("--" + f, nargs="?", const=True, default=False,
                       type=_parse_bool)
    p.add_argument("--train_maps", nargs="+", default=None,
                   help="SMACv2 meta-training map list")
    p.add_argument("--eval_maps", nargs="+", default=None,
                   help="SMACv2 held-out evaluation map list")
    ns = p.parse_args(argv)
    return ns


def make_env_fns(ns, cfg, n, base_seed, seed_stride=1000):
    is_v2 = ns.env_name in ("StarCraft2v2", "SMACv2")
    if is_v2:
        from onpolicy_tpu.envs.starcraft2.distributions import \
            parse_smacv2_distribution
        from onpolicy_tpu.envs.starcraft2.smacv2_env import SMACv2Env
        dist = parse_smacv2_distribution(
            SimpleNamespace(units=ns.units, map_name=ns.map_name))
        # StarCraft2v2 = the reference's SMACv2_modified (agent-specific
        # state + per-agent dones); SMACv2 = the plain wrapper
        modified = ns.env_name == "StarCraft2v2"
        if cfg.use_obs_instead_of_state:
            v2_state = "concat"
        else:
            v2_state = "agent_feature" if modified else "env"

        def fn(rank):
            return lambda: SMACv2Env(ns.map_name, dist,
                                     seed=base_seed + rank * seed_stride,
                                     state_type=v2_state,
                                     per_agent_dones=modified)
    else:
        from onpolicy_tpu.envs.starcraft2.smac_env import SMACEnv
        # use_obs_instead_of_state short-circuits both state families to
        # the concat-of-obs state (StarCraft2_Env.py:1156-1158,1352-1354)
        if cfg.use_obs_instead_of_state:
            state_type = "concat"
        else:
            state_type = "agent_feature" if ns.use_state_agent else "env"
        state_options = {
            k: bool(getattr(ns, k)) for k in (
                "add_center_xy", "use_mustalive", "add_move_state",
                "add_local_obs", "add_distance_state", "add_xy_state",
                "add_visible_state", "add_enemy_action_state",
                "add_agent_id")}

        def fn(rank):
            return lambda: SMACEnv(ns.map_name,
                                   seed=base_seed + rank * seed_stride,
                                   state_type=state_type,
                                   state_options=state_options)
    if cfg.use_stacked_frames:
        from onpolicy_tpu.envs.wrappers import StackedFrames
        inner = fn

        def fn(rank):
            thunk = inner(rank)
            return lambda: StackedFrames(thunk(), cfg.stacked_frames)
    return [fn(i) for i in range(n)]


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    ns = parse_args(argv if argv is not None else sys.argv[1:])
    overrides = {k: v for k, v in vars(ns).items()
                 if k in Config.__dataclass_fields__}
    if ns.env_name not in ("StarCraft2", "StarCraft2v2", "SMAC", "SMACv2"):
        overrides["env_name"] = "StarCraft2"
    if ns.env_name in ("StarCraft2", "SMAC"):
        overrides["num_agents"] = get_map_params(ns.map_name)["n_agents"]
    else:
        overrides["num_agents"] = int(ns.units.split("v")[0])
    overrides["scenario_name"] = ns.map_name
    cfg = canonicalize_algorithm(
        apply_wandb_sweep(Config(**overrides))).validate()

    env_fns = make_env_fns(ns, cfg, cfg.n_rollout_threads, cfg.seed)
    Pool = DummyVecEnv if cfg.n_rollout_threads == 1 else HostVecEnv
    envs = Pool(env_fns, protocol="share")
    eval_envs = None
    if cfg.use_eval:
        # eval seeding scheme: seed*50000 + rank*10000 (train_smac.py:80-99)
        eval_fns = make_env_fns(ns, cfg, cfg.n_eval_rollout_threads,
                                cfg.seed * 50000, seed_stride=10000)
        EPool = DummyVecEnv if cfg.n_eval_rollout_threads == 1 else HostVecEnv
        eval_envs = EPool(eval_fns, protocol="share")

    from onpolicy_tpu.envs.starcraft2.smac_env import smac_win_rate_metrics
    if cfg.algorithm_name in ("happo", "hatrpo"):
        from onpolicy_tpu.runner.host_separated_runner import             HostSeparatedRunner
        runner = HostSeparatedRunner(cfg, envs, eval_env=eval_envs,
                                     env_metrics=smac_win_rate_metrics())
    else:
        runner = HostSharedRunner(cfg, envs, eval_env=eval_envs,
                                  env_metrics=smac_win_rate_metrics())
    run_dir = make_run_dir(cfg)
    logger = MetricsLogger(run_dir, cfg)
    try:
        state, history = runner.run(jax.random.PRNGKey(cfg.seed),
                                    log_fn=logger)
    finally:
        envs.close()
        if eval_envs is not None:
            eval_envs.close()
        logger.close()
    return state, history


if __name__ == "__main__":
    main()
