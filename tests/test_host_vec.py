"""Host ingestion path tests: shared-memory vec env pool protocols and
the host runner end-to-end on a mock SMAC-style env."""
import numpy as np
import pytest

import jax

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.host_vec import DummyVecEnv, HostVecEnv
from onpolicy_tpu.runner.host_runner import HostSharedRunner
from onpolicy_tpu.utils import spaces as sp


class MockSmacEnv:
    """Tiny deterministic 6-tuple-protocol env: M agents, obs encodes a
    counter; episode length 6; agent 0 'dies' at t>=3; bad_transition on
    truncation; reward = action value."""

    M, OBS, STATE, NACT, LIMIT = 3, 8, 12, 5, 6

    def __init__(self, seed=0):
        self.num_agents = self.M
        self.observation_space = [sp.Box((self.OBS,))] * self.M
        self.share_observation_space = [sp.Box((self.STATE,))] * self.M
        self.action_space = [sp.Discrete(self.NACT)] * self.M
        self.t = 0
        self.seed_val = seed

    def _out(self):
        obs = np.full((self.M, self.OBS), float(self.t), np.float32)
        state = np.full((self.M, self.STATE), float(self.t), np.float32)
        avail = np.ones((self.M, self.NACT), np.float32)
        avail[:, -1] = 0.0          # last action always unavailable
        return obs, state, avail

    def reset(self):
        self.t = 0
        return self._out()

    def step(self, actions):
        self.t += 1
        obs, state, avail = self._out()
        rewards = np.asarray(actions, np.float32).reshape(self.M, 1).copy()
        dones = np.zeros(self.M, bool)
        if self.t >= 3:
            dones[0] = True          # agent death
        infos = [{} for _ in range(self.M)]
        if self.t >= self.LIMIT:
            dones[:] = True
            for im in infos:
                im["bad_transition"] = True
        return obs, state, rewards, dones, infos, avail

    def close(self):
        pass


@pytest.mark.parametrize("cls", [DummyVecEnv, HostVecEnv])
def test_share_protocol_roundtrip(cls):
    env = cls([lambda s=i: MockSmacEnv(s) for i in range(4)],
              protocol="share")
    try:
        obs, state, avail = env.reset()
        assert obs.shape == (4, 3, 8)
        assert state.shape == (4, 3, 12)
        assert avail.shape == (4, 3, 5)
        actions = np.ones((4, 3, 1))
        for t in range(1, 7):
            obs, state, rew, dones, infos, avail = env.step(actions)
            if t < 6:
                assert obs[0, 0, 0] == t
                np.testing.assert_array_equal(rew, np.ones((4, 3, 1)))
                assert dones[0, 0] == (t >= 3)
            else:
                # auto-reset: obs from fresh episode, dones all True
                assert obs[0, 0, 0] == 0
                assert dones.all()
                assert infos[0][0]["bad_transition"]
    finally:
        env.close()


def test_choose_protocol_masked_reset():
    env = HostVecEnv([lambda s=i: MockSmacEnv(s) for i in range(3)],
                     protocol="choose")
    try:
        env.reset()
        actions = np.zeros((3, 3, 1))
        for _ in range(6):
            obs, *_ = env.step(actions)
        assert obs[0, 0, 0] == 6      # NO auto-reset
        mask = np.array([True, False, True])
        obs2, _, _ = env.reset(mask)
        assert obs2[0, 0, 0] == 0     # reset
        assert obs2[1, 0, 0] == 6     # untouched
        assert obs2[2, 0, 0] == 0
    finally:
        env.close()


@pytest.mark.parametrize("algo", ["mappo", "rmappo"])
def test_host_runner_end_to_end(algo):
    cfg = config_from_args([
        "--algorithm_name", algo, "--episode_length", "10",
        "--n_rollout_threads", "4", "--num_env_steps", "80",
        "--ppo_epoch", "2", "--hidden_size", "32",
        "--data_chunk_length", "5",
        "--use_eval", "false",
    ])
    env = DummyVecEnv([lambda s=i: MockSmacEnv(s) for i in range(4)],
                      protocol="share")
    try:
        runner = HostSharedRunner(cfg, env)
        ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
        assert len(hist) >= 1
        row = hist[-1]
        assert np.isfinite(row["value_loss"])
        # masked action (last) must never be selected
        # reward == action index; mean reward must be < NACT-1
        assert 0 <= row["average_step_rewards"] <= MockSmacEnv.NACT - 2
        assert 0.0 <= row["dead_ratio"] <= 1.0
    finally:
        env.close()


def test_host_separated_happo():
    from onpolicy_tpu.runner.host_separated_runner import HostSeparatedRunner
    cfg = config_from_args([
        "--algorithm_name", "happo", "--episode_length", "10",
        "--data_chunk_length", "5", "--n_rollout_threads", "4",
        "--num_env_steps", "80", "--ppo_epoch", "2", "--hidden_size", "32",
    ])
    env = DummyVecEnv([lambda s=i: MockSmacEnv(s) for i in range(4)],
                      protocol="share")
    try:
        runner = HostSeparatedRunner(cfg, env)
        states, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
        assert np.isfinite(hist[-1]["agent0/value_loss"])
        assert np.isfinite(hist[-1]["agent2/policy_loss"])
    finally:
        env.close()


def test_bad_masks_slotting():
    """Truncation flags must land at slot t+1 (insert semantics): with the
    mock env truncating at its LIMIT-th step, the buffer row following the
    truncating transition must be 0."""
    from onpolicy_tpu import buffer as bl
    import jax.numpy as jnp

    cfg = config_from_args([
        "--algorithm_name", "mappo", "--episode_length", "12",
        "--n_rollout_threads", "2", "--num_env_steps", "24",
        "--ppo_epoch", "1", "--hidden_size", "32",
        "--use_proper_time_limits",
    ])
    env = DummyVecEnv([lambda s=i: MockSmacEnv(s) for i in range(2)],
                      protocol="share")
    captured = {}
    try:
        runner = HostSharedRunner(cfg, env)
        orig = runner._train_fn

        def spy(ts, buf, nv, key):
            captured["buf"] = buf
            return orig(ts, buf, nv, key)
        runner._train_fn = spy
        runner.run(jax.random.PRNGKey(0), log_fn=None)
    finally:
        env.close()
    bad = np.asarray(captured["buf"].bad_masks)[:, 0, 0, 0]
    # env truncates at its 6th step (t index 5) → slot 6 must be 0
    assert bad[6] == 0.0, bad
    assert bad[5] == 1.0, bad
    # masks mirror: slot 6 = 0 (episode boundary)
    masks = np.asarray(captured["buf"].masks)[:, 0, 0, 0]
    assert masks[6] == 0.0 and masks[5] == 1.0


class MockFootballEnv:
    """4-tuple 'basic' protocol env (GRF-style: fully observed, scalar
    done, shared reward)."""

    M, OBS = 2, 6

    def __init__(self, seed=0):
        self.num_agents = self.M
        self.observation_space = [sp.Box((self.OBS,))] * self.M
        self.share_observation_space = [sp.Box((self.OBS * self.M,))] * self.M
        self.action_space = [sp.Discrete(4)] * self.M
        self.t = 0

    def reset(self):
        self.t = 0
        return np.full((self.M, self.OBS), 0.0, np.float32)

    def step(self, actions):
        self.t += 1
        obs = np.full((self.M, self.OBS), float(self.t), np.float32)
        rew = np.full((self.M, 1), 0.5, np.float32)
        done = self.t >= 5
        dones = np.full(self.M, done)
        return obs, rew, dones, [{"score_reward": 1 if done else 0}] * self.M

    def close(self):
        pass


def test_host_runner_basic_protocol():
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--episode_length", "10",
        "--n_rollout_threads", "2", "--num_env_steps", "40",
        "--ppo_epoch", "1", "--hidden_size", "32",
    ])
    env = DummyVecEnv([lambda s=i: MockFootballEnv(s) for i in range(2)],
                      protocol="basic")
    try:
        runner = HostSharedRunner(cfg, env)
        ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
        assert np.isfinite(hist[-1]["value_loss"])
        assert abs(hist[-1]["average_step_rewards"] - 0.5) < 1e-5
    finally:
        env.close()


def test_choose_simple_protocol():
    """choose_simple: 4-tuple, no auto-reset, masked reset."""

    class Simple4(MockFootballEnv):
        pass

    env = HostVecEnv([lambda s=i: Simple4(s) for i in range(2)],
                     protocol="choose_simple")
    try:
        obs = env.reset()
        assert obs.shape == (2, 2, 6)
        a = np.zeros((2, 2, 1))
        for _ in range(5):
            obs, rew, dones, infos = env.step(a)
        assert dones.all()
        obs, *_ = env.step(a)              # NO auto-reset
        assert obs[0, 0, 0] == 6
        obs2 = env.reset(np.array([True, False]))
        assert obs2[0, 0, 0] == 0 and obs2[1, 0, 0] == 6
    finally:
        env.close()


def test_host_separated_eval_and_checkpoint(tmp_path):
    """HostSeparatedRunner: eval env path, eval_win_rate, checkpoint save
    + model_dir restore (parity: separated smac runner eval + per-agent
    save/restore, separated/base_runner.py:185-203)."""
    from onpolicy_tpu.runner.host_separated_runner import HostSeparatedRunner
    from onpolicy_tpu.config import config_from_args
    args = [
        "--algorithm_name", "happo", "--episode_length", "10",
        "--data_chunk_length", "5", "--n_rollout_threads", "2",
        "--num_env_steps", "40", "--ppo_epoch", "1", "--hidden_size", "32",
        "--use_eval", "--eval_interval", "1", "--eval_episodes", "2",
        "--log_interval", "1",
    ]
    cfg = config_from_args(args)
    env = DummyVecEnv([lambda s=i: MockSmacEnv(s) for i in range(2)],
                      protocol="share")
    ev = DummyVecEnv([lambda s=i: MockSmacEnv(100 + s) for i in range(2)],
                     protocol="share")
    try:
        runner = HostSeparatedRunner(cfg, env, eval_env=ev)
        states, hist = runner.run(jax.random.PRNGKey(0), log_fn=None,
                                  save_dir=tmp_path)
        assert any("eval_average_episode_rewards" in r for r in hist)
        # restore into a fresh runner
        cfg2 = config_from_args(args + ["--model_dir", str(tmp_path)])
        runner2 = HostSeparatedRunner(cfg2, env)
        states2, _ = runner2.run(jax.random.PRNGKey(1), log_fn=None)
        assert np.isfinite(
            np.asarray(jax.tree_util.tree_leaves(states2)[0])).all()
    finally:
        env.close()
        ev.close()
