"""GRF render entry (parity with `/root/reference/onpolicy/scripts/
render/render_football.py`): load a checkpoint, roll deterministic
episodes with the env's own renderer, optionally dump gifs. Import-gated
on gfootball.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.config import get_config, Config, canonicalize_algorithm
from onpolicy_tpu.utils import checkpoint as ckpt
from onpolicy_tpu.utils.render import save_gif, save_video


def parse_args(argv):
    p = get_config()
    p.add_argument("--representation", type=str, default="simple115v2")
    p.add_argument("--rewards", type=str, default="scoring,checkpoints")
    # reference render_football.py:87 --save_videos (.avi via the engine's
    # write_video); we render mp4 via imageio when available, else gif
    from onpolicy_tpu.config import _parse_bool
    p.add_argument("--save_videos", nargs="?", const=True, default=False,
                   type=_parse_bool)
    p.add_argument("--video_dir", type=str, default="")
    return p.parse_args(argv)


def main(argv=None):
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache (fresh-process recompiles)
    ns = parse_args(argv if argv is not None else sys.argv[1:])
    overrides = {k: v for k, v in vars(ns).items()
                 if k in Config.__dataclass_fields__}
    overrides.update(env_name="Football", n_rollout_threads=1)
    cfg = canonicalize_algorithm(Config(**overrides)).validate()

    from onpolicy_tpu.envs.football.football_env import FootballEnv
    env = FootballEnv(scenario_name=cfg.scenario_name,
                      num_agents=cfg.num_agents,
                      representation=ns.representation, rewards=ns.rewards,
                      use_render=True, seed=cfg.seed)
    from onpolicy_tpu.algorithms.mappo import MAPPO
    obs_space = env.observation_space[0]
    share_space = env.share_observation_space[0] if cfg.use_centralized_V \
        else obs_space
    algo = MAPPO(cfg, obs_space, share_space, env.action_space[0])
    state = algo.init_state(jax.random.PRNGKey(cfg.seed))
    if cfg.model_dir:
        restored, _, _ = ckpt.restore(cfg.model_dir, state)
        state = jax.tree_util.tree_map(jnp.asarray, restored)

    M = env.num_agents
    for ep in range(cfg.render_episodes):
        obs = env.reset()
        rnn = algo.actor.init_rnn_state(M)
        masks = jnp.ones((M, 1))
        frames, ep_rew, done = [], 0.0, False
        record = cfg.save_gifs or ns.save_videos
        while not done:
            actions, rnn = algo.act(state, jnp.asarray(obs), rnn, masks,
                                    deterministic=True)
            obs, rew, dones, infos = env.step(np.asarray(actions))
            ep_rew += float(rew.mean())
            done = bool(np.all(dones))
            if record:
                try:
                    frames.append(env.render("rgb_array"))
                except Exception:
                    pass
        if frames and ns.save_videos:
            vdir = ns.video_dir or "videos/football"
            save_video(frames, f"{vdir}/episode_{ep}.mp4", fps=1.0 / cfg.ifi)
        elif frames and cfg.save_gifs:
            save_gif(frames, f"gifs/football/episode_{ep}.gif",
                     fps=1.0 / cfg.ifi)
        print(f"episode {ep}: reward {ep_rew:.2f}")
    env.close()


if __name__ == "__main__":
    main()
