"""SMACv2 adapter: capability-randomized SMAC over the public `smacv2`
package, adapted to the 6-tuple share protocol.

Parity with `/root/reference/onpolicy/envs/starcraft2/SMACv2.py` (which
wraps smacv2's StarCraftCapabilityEnvWrapper): per-episode team
composition and start positions come from the capability distribution
config (our seedable `distributions.py`); protocol/state options match
`smac_env.SMACEnv`. Import-gated (smacv2 + SC2 install).
"""
from __future__ import annotations

import numpy as np

from onpolicy_tpu.utils import spaces as sp


class SMACv2Env:
    def __init__(self, map_name: str, distribution_config: dict,
                 seed=None, state_type: str = "env", **kwargs):
        try:
            from smacv2.env import StarCraftCapabilityEnvWrapper
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "SMACv2Env requires the `smacv2` package and a StarCraft II "
                "install (https://github.com/oxwhirl/smacv2)") from e
        self.env = StarCraftCapabilityEnvWrapper(
            capability_config=distribution_config, map_name=map_name,
            debug=False, conic_fov=False, obs_own_pos=True,
            use_unit_ranges=True, min_attack_range=2, seed=seed, **kwargs)
        info = self.env.get_env_info()
        self.num_agents = M = info["n_agents"]
        self.n_actions = info["n_actions"]
        self.episode_limit = info["episode_limit"]
        self.state_type = state_type
        obs_dim = info["obs_shape"]
        state_dim = info["state_shape"]
        share_dim = {"concat": obs_dim * M,
                     "agent": state_dim + obs_dim}.get(state_type, state_dim)
        self.observation_space = [sp.Box((obs_dim,))] * M
        self.share_observation_space = [sp.Box((share_dim,))] * M
        self.action_space = [sp.Discrete(self.n_actions)] * M

    def _share_obs(self, obs):
        M = self.num_agents
        if self.state_type == "concat":
            return np.tile(np.concatenate(obs, -1), (M, 1)).astype(np.float32)
        state = np.asarray(self.env.get_state(), np.float32)
        if self.state_type == "agent":
            return np.stack([np.concatenate([state, o]) for o in obs]
                            ).astype(np.float32)
        return np.tile(state, (M, 1)).astype(np.float32)

    def _gather(self):
        obs = np.asarray(self.env.get_obs(), np.float32)
        avail = np.asarray(self.env.get_avail_actions(), np.float32)
        return obs, self._share_obs(obs), avail

    def reset(self):
        self.env.reset()
        return self._gather()

    def step(self, actions):
        M = self.num_agents
        acts = np.asarray(actions).reshape(M).astype(np.int64)
        reward, terminated, info = self.env.step(acts)
        obs, share, avail = self._gather()
        rewards = np.full((M, 1), float(reward), np.float32)
        dones = np.ones(M, bool) if terminated else np.zeros(M, bool)
        base = {
            "battles_won": getattr(self.env.env, "battles_won", 0),
            "battles_game": getattr(self.env.env, "battles_game", 0),
            "bad_transition": bool(terminated
                                   and info.get("episode_limit", False)),
            "won": bool(info.get("battle_won", False)),
        }
        return obs, share, rewards, dones, [dict(base)] * M, avail

    def close(self):
        self.env.close()
