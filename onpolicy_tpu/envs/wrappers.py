"""Env-side wrappers for host envs.

StackedFrames: parity with the reference's stacked-frames option
(`--use_stacked_frames --stacked_frames K`, consumed by SMAC's env in
`StarCraft2_Env.py:325-327,605-613`): observations (and centralized
states) become the concatenation of the last K frames, zero-padded
after reset.
"""
from __future__ import annotations

from collections import deque

import numpy as np

from onpolicy_tpu.utils import spaces as sp


class StackedFrames:
    """Wrap a share-protocol env; obs/share_obs become K-frame stacks."""

    def __init__(self, env, k: int):
        self.env = env
        self.k = k
        self.num_agents = env.num_agents
        self.action_space = env.action_space

        def stack_space(s):
            s0 = s[0] if isinstance(s, (list, tuple)) else s
            return [sp.Box((s0.shape[0] * k,))] * self.num_agents

        self.observation_space = stack_space(env.observation_space)
        self.share_observation_space = stack_space(
            env.share_observation_space)
        self._obs_frames = deque(maxlen=k)
        self._share_frames = deque(maxlen=k)

    def _stacked(self):
        def cat(frames, latest):
            pads = [np.zeros_like(latest)] * (self.k - len(frames))
            return np.concatenate(pads + list(frames), axis=-1)
        return (cat(self._obs_frames, self._obs_frames[-1]),
                cat(self._share_frames, self._share_frames[-1]))

    def reset(self):
        obs, share, avail = self.env.reset()
        self._obs_frames.clear()
        self._share_frames.clear()
        self._obs_frames.append(obs)
        self._share_frames.append(share)
        o, s = self._stacked()
        return o, s, avail

    def step(self, actions):
        obs, share, rew, dones, infos, avail = self.env.step(actions)
        if np.ndim(dones) and np.all(dones):
            self._obs_frames.clear()
            self._share_frames.clear()
        self._obs_frames.append(obs)
        self._share_frames.append(share)
        o, s = self._stacked()
        return o, s, rew, dones, infos, avail

    def close(self):
        self.env.close()
