"""Batched Hanabi environment (turn-based, Choose-protocol semantics).

Parity with `/root/reference/onpolicy/envs/hanabi/Hanabi_Env.py`:
  * presets Hanabi-Full / Full-Minimal / Small / Very-Small
    (`Hanabi_Env.py:118-160`);
  * obs = canonical encoding + current-player one-hot "agent_turn"
    (`:305`);
  * share_obs = own-hand encoding + obs + agent_turn (centralized critic
    sees the current player's hidden hand, `:306-311`), or concat of all
    players' obs under use_obs_instead_of_state;
  * action −1 = no-op for non-acting seats (`:461-468`), returning
    zeroed rows; reward = score delta broadcast to all players;
  * no auto-reset — the runner masks resets (Choose protocol).

Unlike the reference's one-env-per-subprocess pool, all N games run in
the native batched engine (`cpp/hanabi`), so reset/step/observe is one
FFI call for the fleet.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from onpolicy_tpu.envs.hanabi.binding import HanabiBatch
from onpolicy_tpu.utils import spaces as sp

PRESETS = {
    "Hanabi-Full": dict(colors=5, ranks=5, max_info=8, max_life=3,
                        hand_size=-1, minimal=False),
    # MINIMAL observation_type: no V0-belief section (Hanabi_Env.py:136)
    "Hanabi-Full-Minimal": dict(colors=5, ranks=5, max_info=8, max_life=3,
                                hand_size=-1, minimal=True),
    "Hanabi-Small": dict(colors=2, ranks=5, max_info=3, max_life=1,
                         hand_size=2, minimal=False),
    "Hanabi-Very-Small": dict(colors=1, ranks=5, max_info=3, max_life=1,
                              hand_size=2, minimal=False),
}


class HanabiVecEnv:
    """N lockstep games; Choose-protocol batched API."""

    def __init__(self, hanabi_name: str, num_agents: int, n_envs: int,
                 seed: int = 0, use_obs_instead_of_state: bool = False):
        if hanabi_name not in PRESETS:
            raise ValueError(f"unknown hanabi preset {hanabi_name!r}; "
                             f"known: {sorted(PRESETS)}")
        p = PRESETS[hanabi_name]
        self.batch = HanabiBatch(n_envs, colors=p["colors"], ranks=p["ranks"],
                                 players=num_agents,
                                 hand_size=p["hand_size"],
                                 max_info=p["max_info"],
                                 max_life=p["max_life"],
                                 minimal=p["minimal"], seed=seed)
        self.n_envs = n_envs
        self.num_agents = M = num_agents
        self.obs_instead_of_state = use_obs_instead_of_state
        self.obs_dim = self.batch.obs_dim + M
        if use_obs_instead_of_state:
            self.share_dim = self.batch.obs_dim * M + M
        else:
            self.share_dim = self.batch.ownhand_dim + self.batch.obs_dim + M
        self.n_moves = self.batch.max_moves
        self.observation_space = [sp.Box((self.obs_dim,))] * M
        self.share_observation_space = [sp.Box((self.share_dim,))] * M
        self.action_space = [sp.Discrete(self.n_moves)] * M

    # ------------------------------------------------------------------
    def _gather(self):
        obs_raw, own, avail, cur, done, score = self.batch.observe()
        N, M = self.n_envs, self.num_agents
        turn = np.zeros((N, M), np.float32)
        turn[np.arange(N), cur] = 1.0
        obs = np.concatenate([obs_raw, turn], -1)
        if self.obs_instead_of_state:
            # concat of every seat's canonical view + agent_turn
            # (Hanabi_Env.py:306-311 use_obs_instead_of_state branch)
            views = [self.batch.observe_player(p)
                     for p in range(self.num_agents)]
            share = np.concatenate(views + [turn], -1)
        else:
            share = np.concatenate([own, obs_raw, turn], -1)
        # finished games present zeroed rows + zero avail (reference
        # returns zeros for envs without available actions)
        dead = done.astype(bool)
        obs[dead] = 0.0
        share[dead] = 0.0
        avail = avail.copy()
        avail[dead] = 0.0
        return obs, share, avail, cur, dead, score

    def reset(self, reset_choose: Optional[np.ndarray] = None):
        self.batch.reset(None if reset_choose is None
                         else np.asarray(reset_choose, bool))
        obs, share, avail, cur, done, score = self._gather()
        return obs, share, avail, cur

    def step(self, actions: np.ndarray):
        """actions [N] int, −1 no-op → (obs, share_obs, rewards [N,M,1],
        done [N], cur_player [N], avail [N,A], scores [N])."""
        rew = self.batch.step(np.asarray(actions, np.int64))
        obs, share, avail, cur, done, score = self._gather()
        rewards = np.repeat(rew[:, None, None], self.num_agents, axis=1)
        return obs, share, rewards, done, cur, avail, score

    def close(self):
        self.batch.close()
