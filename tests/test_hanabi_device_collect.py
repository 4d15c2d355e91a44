"""Bit-exact equivalence of the Hanabi device-collect round vs the host
seat loop.

Two runners with identically-seeded engines and parameters, driven with
deterministic (argmax) actions so identical trajectories are forced:
after every seat round, the turn staging, reset vector, and post-reset
observation state must match exactly between `_host_round` and the
jitted `_device_round` (io_callback env stepping).
"""
import functools

import jax
import numpy as np
import pytest

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.hanabi_runner import HanabiRunner

ARGS = [
    "--algorithm_name", "mappo", "--env_name", "Hanabi",
    "--scenario_name", "Hanabi-Small", "--num_agents", "2",
    "--n_rollout_threads", "6", "--episode_length", "12",
    "--num_env_steps", "144", "--hidden_size", "32",
    "--use_recurrent_policy", "false",
]

STAGING = ("obs", "share_obs", "avail", "values", "actions", "logp",
           "rnn", "rnn_critic", "rewards", "active", "accum")


def _make_runner(extra=()):
    cfg = config_from_args(ARGS + list(extra))
    runner = HanabiRunner(cfg)
    # force deterministic actions so both paths pick identical moves
    # (the runner's collection flag is read when _actor_fn first traces)
    runner._det_collect = True
    return runner


def _fresh_state(runner):
    obs, share, avail, _ = runner.envs.reset()
    if not runner.cfg.use_centralized_V:
        share = obs
    use = {"obs": obs.copy(), "share": share.copy(), "avail": avail.copy()}
    N, M = runner.N, runner.num_agents
    L, H = runner.cfg.recurrent_N, runner.cfg.hidden_size
    turn = {
        "obs": np.zeros((N, M, obs.shape[-1]), np.float32),
        "share_obs": np.zeros((N, M, share.shape[-1]), np.float32),
        "avail": np.zeros((N, M, avail.shape[-1]), np.float32),
        "values": np.zeros((N, M, 1), np.float32),
        "actions": np.zeros((N, M, 1), np.float32),
        "logp": np.zeros((N, M, 1), np.float32),
        "rnn": np.zeros((N, M, L, H), np.float32),
        "rnn_critic": np.zeros((N, M, L, H), np.float32),
        "masks": np.ones((N, M, 1), np.float32),
        "active": np.ones((N, M, 1), np.float32),
        "rewards": np.zeros((N, M, 1), np.float32),
        "accum": np.zeros((N, M, 1), np.float32),
    }
    return use, turn


@pytest.mark.parametrize("extra", [
    (), ("--use_centralized_V", "false"),
    ("--use_recurrent_policy", "true"),
])
def test_device_round_matches_host_round(extra):
    rh = _make_runner(extra)
    rd = _make_runner(extra)
    ts_h = rh.algo.init_state(jax.random.PRNGKey(7))
    ts_d = rd.algo.init_state(jax.random.PRNGKey(7))

    use, turn = _fresh_state(rh)
    use_d, turn_d = _fresh_state(rd)
    carry = rd._init_device_carry(use_d["obs"], use_d["share"],
                                  use_d["avail"], turn_d)
    round_jit = jax.jit(rd._device_round)

    key_h = jax.random.PRNGKey(3)
    key_d = jax.random.PRNGKey(3)
    rounds = 40                      # Hanabi-Small games finish well within
    saw_reset = False
    for step in range(rounds):
        key_h, reset_h, scores_h = rh._host_round(ts_h, turn, use, key_h)
        carry, aux = round_jit(ts_d, carry, key_d)
        key_d = aux["key"]
        reset_d = np.asarray(aux["reset_choose"])

        np.testing.assert_array_equal(reset_h, reset_d)
        saw_reset = saw_reset or reset_h.any()
        host_stage = jax.device_get({k: carry[k] for k in STAGING})
        for k in STAGING:
            np.testing.assert_array_equal(
                turn[k], host_stage[k], err_msg=f"round {step} field {k}")
        # buffer slots the pre-reset masks
        np.testing.assert_array_equal(turn["masks"],
                                      np.asarray(aux["masks_insert"]),
                                      err_msg=f"round {step} masks")
        # finished-game score accounting agrees
        assert len(scores_h) == int(aux["score_n"])
        np.testing.assert_allclose(sum(scores_h), float(aux["score_sum"]),
                                   rtol=1e-6)

        # host path: masked reset outside the round (run() does this);
        # device path resets in-round
        if reset_h.any():
            obs, share, avail, _ = rh.envs.reset(reset_h)
            if not rh.cfg.use_centralized_V:
                share = obs
            use["obs"][reset_h] = obs[reset_h]
            use["share"][reset_h] = share[reset_h]
            use["avail"][reset_h] = avail[reset_h]
            turn["masks"][reset_h] = 1.0

        for k, dk in (("obs", "use_obs"), ("share", "use_share"),
                      ("avail", "use_avail")):
            np.testing.assert_array_equal(
                use[k], np.asarray(carry[dk]),
                err_msg=f"round {step} use.{k}")
        np.testing.assert_array_equal(turn["masks"],
                                      np.asarray(carry["masks"]))
    assert saw_reset, "test never exercised a game ending + masked reset"
    rh.envs.close()
    rd.envs.close()


def test_scan_rounds_matches_host_run():
    """use_scan_rounds (whole episode = ONE jitted program) reproduces
    the host loop's training trajectory: same seeds → same metrics and
    matching final parameters."""
    extra = ("--episode_length", "8", "--num_env_steps", "288",
             "--ppo_epoch", "2", "--hidden_size", "32")
    rh = _make_runner(extra)
    rs = _make_runner(extra + ("--use_scan_rounds", "true"))
    ts_h, hist_h = rh.run(jax.random.PRNGKey(0), log_fn=None)
    ts_s, hist_s = rs.run(jax.random.PRNGKey(0), log_fn=None)
    rows_h = [r for r in hist_h if "value_loss" in r]
    rows_s = [r for r in hist_s if "value_loss" in r]
    assert rows_h and len(rows_h) == len(rows_s)
    for a, b in zip(rows_h, rows_s):
        assert a["episode"] == b["episode"]
        assert a["true_steps"] == b["true_steps"]
        np.testing.assert_allclose(a["value_loss"], b["value_loss"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a["average_score"], b["average_score"],
                                   rtol=1e-6, atol=1e-6)
    leaves_h = jax.tree_util.tree_leaves(ts_h.actor_params)
    leaves_s = jax.tree_util.tree_leaves(ts_s.actor_params)
    for lh, ls in zip(leaves_h, leaves_s):
        np.testing.assert_allclose(np.asarray(lh), np.asarray(ls),
                                   rtol=1e-4, atol=1e-5)
    rh.envs.close()
    rs.envs.close()


def test_device_collect_full_run_trains():
    """run() with use_device_collect goes through deferred train, buffer
    slotting, logging, and produces finite losses."""
    runner = _make_runner(("--use_device_collect", "true",
                           "--episode_length", "8",
                           "--num_env_steps", "192",
                           "--ppo_epoch", "2"))
    ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
    assert len(hist) >= 1
    assert np.isfinite(hist[-1].get("value_loss", 0.0))
    assert hist[-1]["true_steps"] > 0
    runner.envs.close()


def test_host_round_break_zeroes_future_values():
    """Round-4 code-review finding: when every env dies at seat 0 the
    seat loop breaks before visiting seat 1 — the unvisited seats'
    staged value_preds must still be zeroed (the old code zeroed them
    AT DEATH; the deferred-critic compose must cover unvisited seats)."""
    import numpy as np

    runner = _make_runner()
    N, M = runner.N, runner.num_agents
    Do, Ds, A = runner.envs.obs_dim, runner.envs.share_dim, \
        runner.envs.n_moves

    class FakeVec:
        """Every env reports done on the first step of the round."""
        obs_dim, share_dim, n_moves = Do, Ds, A

        def step(self, env_actions):
            obs = np.zeros((N, Do), np.float32)
            share = np.zeros((N, Ds), np.float32)
            rewards = np.zeros((N, M, 1), np.float32)
            done = np.ones(N, bool)
            avail = np.zeros((N, A), np.float32)
            score = np.full(N, 5.0, np.float32)
            return obs, share, rewards, done, None, avail, score

    runner.envs = FakeVec()
    ts = runner.algo.init_state(jax.random.PRNGKey(0))
    obs = np.random.default_rng(0).normal(size=(N, Do)).astype(np.float32)
    share = np.random.default_rng(1).normal(size=(N, Ds)).astype(np.float32)
    avail = np.ones((N, A), np.float32)
    use, turn = runner._fresh_staging(obs, share, avail)
    turn["values"][:] = 7.0          # stale sentinel from a prior round

    _, reset_choose, scores = runner._host_round(
        ts, turn, use, jax.random.PRNGKey(1))

    assert reset_choose.all() and len(scores) == N
    # seat 0 was acted on -> fresh critic values (not the sentinel)
    assert not np.any(turn["values"][:, 0] == 7.0)
    # seats after the death must be ZEROED even though the loop never
    # visited them (all envs dead -> break at seat 1)
    np.testing.assert_array_equal(turn["values"][:, 1:], 0.0)
    np.testing.assert_array_equal(turn["rnn_critic"], 0.0)


def test_det_collect_frozen_after_trace():
    """ADVICE round 4: _det_collect is baked into the jitted collection
    trace — toggling it afterwards must raise, not silently no-op."""
    import pytest
    runner = _make_runner()
    runner._det_collect = True          # before any trace: fine
    runner._det_collect = False
    ts, carry, dbuf = runner.init_device(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    carry, aux = jax.jit(runner._device_round)(ts, carry, key)
    jax.block_until_ready(aux["reset_choose"])
    runner._det_collect = False         # same value: allowed
    with pytest.raises(RuntimeError, match="baked into"):
        runner._det_collect = True
