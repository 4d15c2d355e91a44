"""REAL external engine through the host-ingestion pool, end to end
(round-4 VERDICT item 3).

The reference's whole Hanabi data path runs real engines in worker
subprocesses (`ChooseSubprocVecEnv` of `Hanabi_Env`,
`env_wrappers.py:493-575`); the repo equivalent is `HostVecEnv`
protocol "choose" over `HanabiSingleEnv` (one native C++ game per
worker). These tests drive that seam with the REAL engine — worker
processes, shm blocks, masked choose-resets — and pin it bit-for-bit
against an in-process direct path over identically-seeded engines.
"""
from __future__ import annotations

import numpy as np
import pytest

from onpolicy_tpu.envs.hanabi.hanabi_env import (HanabiHostPoolEnv,
                                                 HanabiSingleEnv)
from onpolicy_tpu.envs.host_vec import DummyVecEnv, HostVecEnv

NAME = "Hanabi-Very-Small"
M = 2


def _fns(n, base_seed):
    return [
        (lambda s=base_seed + i: HanabiSingleEnv(NAME, M, seed=s))
        for i in range(n)
    ]


def _drive(env, steps, n):
    """Scripted first-legal-action driver with masked resets; returns
    the stacked (obs, share, rewards, dones, avail) stream."""
    rows = []
    obs, share, avail = env.reset()
    for t in range(steps):
        acts = np.full((n, M, 1), -1.0, np.float32)
        for i in range(n):
            legal = np.nonzero(avail[i] > 0)[0]
            if legal.size:
                acts[i, :, 0] = float(legal[t % legal.size])
        obs, share, rewards, dones, infos, avail = env.step(acts)
        rows.append((obs.copy(), share.copy(), rewards.copy(),
                     np.asarray(dones).copy(), avail.copy()))
        done_env = np.asarray(dones).reshape(n, -1)[:, 0].astype(bool)
        if done_env.any():
            obs, share, avail = env.reset(done_env)
    return [np.stack(cols) for cols in zip(*rows)]


def test_pool_matches_direct_stream():
    """HostVecEnv (real worker processes + shm) over the native engine
    reproduces the in-process direct stream exactly, including masked
    resets after finished games."""
    n, steps = 3, 60
    pool = HostVecEnv(_fns(n, 100), protocol="choose")
    try:
        got = _drive(pool, steps, n)
    finally:
        pool.close()
    direct = DummyVecEnv(_fns(n, 100), protocol="choose")
    try:
        want = _drive(direct, steps, n)
    finally:
        direct.close()
    names = ("obs", "share", "rewards", "dones", "avail")
    for nm, g, w in zip(names, got, want):
        np.testing.assert_array_equal(g, w, err_msg=nm)
    # sanity: at least one game finished so the masked-reset path ran
    assert got[3].any()


def test_runner_over_real_pool():
    """HanabiRunner end to end over the pool facade (real engine, real
    workers) == the same runner over the in-process facade: identical
    training metrics and scores."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.hanabi_runner import HanabiRunner

    def run_one(pool_cls):
        cfg = config_from_args([
            "--algorithm_name", "mappo", "--scenario_name", NAME,
            "--num_agents", str(M),
            "--n_rollout_threads", "4", "--episode_length", "8",
            "--num_env_steps", "64", "--ppo_epoch", "2",
            "--hidden_size", "32", "--layer_N", "1", "--seed", "7",
            "--log_interval", "1",
        ], env_name="Hanabi")
        pool = pool_cls(_fns(4, 50), protocol="choose")
        env = HanabiHostPoolEnv(pool, M)
        try:
            runner = HanabiRunner(cfg, vec_env=env)
            _, history = runner.run(log_fn=lambda row: None)
        finally:
            env.close()
        return history

    h_pool = run_one(HostVecEnv)
    h_direct = run_one(DummyVecEnv)
    assert len(h_pool) == len(h_direct) > 0
    for rp, rd in zip(h_pool, h_direct):
        assert set(rp) == set(rd)
        for k in rp:
            if k == "fps":
                continue
            np.testing.assert_allclose(rp[k], rd[k], rtol=1e-5,
                                       err_msg=k)
