"""Hanabi engine + env + runner tests (native C++ through the binding)."""
import numpy as np
import pytest

import jax

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.hanabi.binding import HanabiBatch
from onpolicy_tpu.envs.hanabi.hanabi_env import HanabiVecEnv
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner


class TestEngine:
    def test_dims_full(self):
        b = HanabiBatch(2, colors=5, ranks=5, players=2, max_info=8,
                        max_life=3, seed=0)
        assert b.max_moves == 20
        assert b.obs_dim == 658          # known HLE canonical 2p dim
        assert b.ownhand_dim == 125
        b.close()

    def test_initial_observation(self):
        b = HanabiBatch(4, colors=2, ranks=5, players=2, hand_size=2,
                        max_info=3, max_life=1, seed=1)
        obs, own, avail, cur, done, score = b.observe()
        assert (cur == 0).all() and not done.any() and (score == 0).all()
        # discard illegal at full info tokens (uids 0..1); play legal (2..3)
        assert (avail[:, :2] == 0).all()
        assert (avail[:, 2:4] == 1).all()
        # own hand has exactly hand_size bits
        assert (own.sum(-1) == 2).all()
        b.close()

    def test_noop_is_inert(self):
        b = HanabiBatch(2, colors=2, ranks=5, players=2, hand_size=2,
                        max_info=3, max_life=1, seed=2)
        before = b.observe()[0]
        rew = b.step(np.full(2, -1))
        after = b.observe()[0]
        np.testing.assert_array_equal(before, after)
        assert (rew == 0).all()
        b.close()

    def test_oracle_scores_well(self):
        """A cheating oracle (reads its own hand, plays exactly the
        playable cards) must average >5/10 on Hanabi-Small — validates
        fireworks/draw/terminal logic end to end."""
        H, C, R = 2, 2, 5
        b = HanabiBatch(32, colors=C, ranks=R, players=2, hand_size=H,
                        max_info=3, max_life=1, seed=0)
        fw_off = (2 - 1) * H * C * R + 2 + (20 - 2 * H)  # hands + deck-thermometer
        scores = []
        b.reset()
        for _ in range(600):
            obs, own, avail, cur, done, score = b.observe()
            acts = np.full(32, -1, np.int32)
            for i in range(32):
                if done[i]:
                    continue
                fw = obs[i, fw_off:fw_off + C * R].reshape(C, R)
                level = np.array([np.argmax(f) + 1 if f.any() else 0
                                  for f in fw])
                ohand = own[i].reshape(H, C, R)
                choice = -1
                for s in range(H):
                    if ohand[s].any():
                        c, r = np.argwhere(ohand[s])[0]
                        if level[c] == r:
                            choice = H + s
                            break
                if choice < 0:
                    for uid in list(range(H)) + list(range(2 * H,
                                                           b.max_moves)):
                        if avail[i, uid] > 0:
                            choice = uid
                            break
                acts[i] = choice
            b.step(acts)
            _, _, _, _, done2, score2 = b.observe()
            newly = done2 & ~done
            scores.extend(score2[newly].tolist())
            b.reset(newly)
            if len(scores) >= 60:
                break
        b.close()
        assert len(scores) >= 30
        assert np.mean(scores) > 5.0, f"oracle mean {np.mean(scores)}"


class TestEnv:
    def test_presets_and_spaces(self):
        env = HanabiVecEnv("Hanabi-Small", 2, 4, seed=0)
        assert env.obs_dim == env.batch.obs_dim + 2
        assert env.share_dim == env.batch.ownhand_dim + env.batch.obs_dim + 2
        obs, share, avail, cur = env.reset()
        assert obs.shape == (4, env.obs_dim)
        # agent_turn one-hot appended
        np.testing.assert_array_equal(obs[:, -2:], [[1, 0]] * 4)
        env.close()
        with pytest.raises(ValueError):
            HanabiVecEnv("Hanabi-Nope", 2, 1)

    def test_turn_rotation_and_noop(self):
        env = HanabiVecEnv("Hanabi-Small", 2, 3, seed=0)
        obs, share, avail, cur = env.reset()
        legal = np.argmax(avail, axis=1)
        obs2, share2, rew, done, cur2, avail2, score = env.step(legal)
        assert (cur2 == 1).all()
        env.close()


class TestRunner:
    def test_short_training_run(self):
        cfg = config_from_args([
            "--algorithm_name", "mappo", "--env_name", "Hanabi",
            "--scenario_name", "Hanabi-Very-Small", "--num_agents", "2",
            "--n_rollout_threads", "4", "--episode_length", "8",
            "--num_env_steps", "128", "--ppo_epoch", "2",
            "--hidden_size", "32", "--log_interval", "1",
        ])
        runner = HanabiRunner(cfg)
        ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
        assert len(hist) >= 1
        assert np.isfinite(hist[-1].get("value_loss", 0.0))
        score = runner.evaluate(ts, 5)
        assert 0.0 <= score <= 5.0


def test_obs_instead_of_state():
    env = HanabiVecEnv("Hanabi-Small", 2, 3, seed=1,
                       use_obs_instead_of_state=True)
    try:
        obs, share, avail, cur = env.reset()
        assert share.shape == (3, env.batch.obs_dim * 2 + 2)
        # seat-0's view inside the concat equals the current-player obs
        # (current player IS seat 0 at reset)
        np.testing.assert_array_equal(share[:, :env.batch.obs_dim],
                                      obs[:, :env.batch.obs_dim])
    finally:
        env.close()
