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


class HanabiSingleEnv:
    """ONE Hanabi game over the native engine, presenting the reference
    per-env Choose contract (`Hanabi_Env.py:188-505`): `reset()` →
    (obs, share_obs, available_actions); `step(a)` → (obs, share_obs,
    rewards [M,1], dones [M], info, avail). This is the env the
    host-ingestion pool (`HostVecEnv` protocol "choose" — the
    `ChooseSubprocVecEnv` family, `env_wrappers.py:493-575`) runs in its
    worker processes, i.e. a REAL external engine behind the pool."""

    def __init__(self, hanabi_name: str, num_agents: int, seed: int = 0,
                 use_obs_instead_of_state: bool = False):
        self._vec = HanabiVecEnv(
            hanabi_name, num_agents, 1, seed=seed,
            use_obs_instead_of_state=use_obs_instead_of_state)
        self.num_agents = num_agents
        self.observation_space = self._vec.observation_space
        self.share_observation_space = self._vec.share_observation_space
        self.action_space = self._vec.action_space

    def reset(self):
        obs, share, avail, cur = self._vec.reset()
        return obs[0], share[0], avail[0]

    def step(self, action):
        # pool workers hand the [M, act_dim] slice of the action block;
        # the turn-based protocol uses one action per env (the current
        # seat's), so every row carries the same value
        a = int(np.asarray(action).reshape(-1)[0])
        obs, share, rewards, done, cur, avail, score = self._vec.step(
            np.asarray([a], np.int64))
        info = {"score": int(score[0])}
        dones = np.full((self.num_agents,), bool(done[0]))
        return obs[0], share[0], rewards[0], dones, info, avail[0]

    def close(self):
        self._vec.close()


class HanabiHostPoolEnv:
    """`HanabiVecEnv`-protocol facade over a pool of per-env native
    engines — the reference's actual Hanabi data path
    (`ChooseSubprocVecEnv` of `Hanabi_Env`, `train_hanabi_forward.py:
    25-47`) driven through the shm host-ingestion pool. `pool` is a
    HostVecEnv/DummyVecEnv with protocol "choose" whose envs are
    `HanabiSingleEnv`s. The current player is recovered from the
    agent-turn one-hot tail of obs; scores ride the step infos."""

    def __init__(self, pool, num_agents: int):
        self.pool = pool
        self.n_envs = pool.n_envs
        self.num_agents = num_agents
        self.observation_space = pool.observation_space
        self.share_observation_space = pool.share_observation_space
        self.action_space = pool.action_space
        self.obs_dim = self.observation_space[0].shape[0]
        self.share_dim = self.share_observation_space[0].shape[0]
        self.n_moves = self.action_space[0].n
        self._last_score = np.zeros(self.n_envs, np.float32)

    def _cur(self, obs):
        turn = obs[:, -self.num_agents:]
        return np.argmax(turn, axis=1).astype(np.int32)

    def reset(self, reset_choose: Optional[np.ndarray] = None):
        obs, share, avail = self.pool.reset(reset_choose)
        return obs, share, avail, self._cur(obs)

    def step(self, actions: np.ndarray):
        acts = np.repeat(np.asarray(actions, np.float32)[:, None, None],
                         self.num_agents, axis=1)
        obs, share, rewards, dones, infos, avail = self.pool.step(acts)
        score = np.asarray([i.get("score", 0) for i in infos], np.float32)
        done = np.asarray(dones)[:, 0].astype(bool)
        return obs, share, rewards, done, self._cur(obs), avail, score

    def close(self):
        self.pool.close()
