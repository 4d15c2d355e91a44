"""MPE render entry: load a checkpoint, roll deterministic episodes, and
save gifs (parity with `/root/reference/onpolicy/scripts/render/
render_mpe.py` + `mpe_runner.render:185-248`).

    python -m onpolicy_tpu.scripts.render_mpe --model_dir <ckpt> \
        --scenario_name simple_spread --render_episodes 3 --save_gifs
"""
from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.mpe.env import MPEEnv
from onpolicy_tpu.runner.shared_runner import SharedRunner
from onpolicy_tpu.utils import checkpoint as ckpt
from onpolicy_tpu.utils.render import render_frame, save_gif


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    cfg = config_from_args(argv, n_rollout_threads=1, use_render=True)
    runner = SharedRunner(cfg.replace(n_rollout_threads=1))
    state = runner.algo.init_state(jax.random.PRNGKey(cfg.seed))
    if cfg.model_dir:
        restored, _, _ = ckpt.restore(cfg.model_dir, state)
        state = jax.tree_util.tree_map(jnp.asarray, restored)

    env = MPEEnv(cfg.scenario_name, cfg.num_agents, cfg.num_landmarks,
                 cfg.episode_length)
    out_dir = Path("gifs") / cfg.scenario_name
    key = jax.random.PRNGKey(cfg.seed)
    all_rewards = []
    for ep in range(cfg.render_episodes):
        key, k = jax.random.split(key)
        env_state, obs = env.reset(k)
        frames = [render_frame(env.spec, env_state)]
        rnn = runner.algo.actor.init_rnn_state(env.num_agents)
        masks = jnp.ones((env.num_agents, 1))
        ep_rew = 0.0
        for t in range(cfg.episode_length):
            obs_mat = jnp.stack(obs)
            actions, rnn = runner.algo.act(state, obs_mat, rnn, masks,
                                           deterministic=True)
            key, k = jax.random.split(key)
            env_state, obs, rewards, done = env.step(
                env_state, actions.astype(jnp.int32), k)
            ep_rew += float(jnp.mean(rewards))
            frames.append(render_frame(env.spec, env_state))
        all_rewards.append(ep_rew)
        if cfg.save_gifs:
            path = save_gif(frames, out_dir / f"episode_{ep}.gif",
                            fps=1.0 / cfg.ifi)
            print(f"wrote {path}")
        print(f"episode {ep}: reward {ep_rew:.2f}")
    print(f"average episode reward: {np.mean(all_rewards):.2f}")
    return all_rewards


if __name__ == "__main__":
    main(sys.argv[1:])
