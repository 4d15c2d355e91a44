"""Host-ingestion runner multi-chip + exact-resume tests.

Equality contract (SURVEY §5.8): the sharded host path — params
replicated on the mesh, episode buffer env-axis sharded along 'data',
grad/normalizer psums inserted by XLA — must produce the SAME updates
as the unsharded path (sharding changes layout, not semantics), like
tests/test_sharding.py does for the device-resident runners.

Exact-resume contract (reference beats: `base_runner.py:143-162` is
weights-only): kill-and-resume must continue with identical metrics vs
an uninterrupted run. The mock env's episode limit equals the buffer T
so the external-env state at every episode boundary is the freshly
auto-reset state — the one thing a restarted pool can reproduce.
"""
import numpy as np
import pytest

import jax

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.host_vec import DummyVecEnv
from onpolicy_tpu.runner.host_runner import HostSharedRunner
from onpolicy_tpu.runner.host_separated_runner import HostSeparatedRunner
from tests.test_host_vec import MockSmacEnv


def _make_env(n=8):
    return DummyVecEnv([lambda s=i: MockSmacEnv(s) for i in range(n)],
                       protocol="share")


def _shared_cfg(mesh, algo="rmappo", steps=160, extra=()):
    return config_from_args([
        "--algorithm_name", algo, "--episode_length", "10",
        "--n_rollout_threads", "8", "--num_env_steps", str(steps),
        "--ppo_epoch", "2", "--hidden_size", "32",
        "--data_chunk_length", "5", "--use_eval", "false",
        "--log_interval", "1", "--mesh_shape", str(mesh), *extra,
    ])


def _run_shared(mesh, algo="rmappo"):
    env = _make_env()
    try:
        runner = HostSharedRunner(_shared_cfg(mesh, algo), env)
        ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
        return jax.device_get(ts.actor_params), hist
    finally:
        env.close()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_host_shared_mesh_matches_single_device():
    p1, h1 = _run_shared(1)
    p4, h4 = _run_shared(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(h1[-1]["value_loss"], h4[-1]["value_loss"],
                               rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_host_separated_mesh_matches_single_device():
    def run(mesh):
        env = _make_env()
        try:
            cfg = config_from_args([
                "--algorithm_name", "happo", "--episode_length", "10",
                "--data_chunk_length", "5", "--n_rollout_threads", "8",
                "--num_env_steps", "160", "--ppo_epoch", "2",
                "--hidden_size", "32", "--log_interval", "1",
                "--mesh_shape", str(mesh),
            ])
            runner = HostSeparatedRunner(cfg, env)
            states, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
            return jax.device_get(states[0].actor_params), hist
        finally:
            env.close()

    p1, h1 = run(1)
    p4, h4 = run(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(h1[-1]["agent0/value_loss"],
                               h4[-1]["agent0/value_loss"],
                               rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# exact kill-and-resume
# ---------------------------------------------------------------------------

def _aligned_cfg(steps, extra=()):
    # episode_length == MockSmacEnv.LIMIT == 6: every run_episode ends
    # exactly on the env auto-reset, so a restarted pool reproduces the
    # boundary state and resume can be bit-exact
    return config_from_args([
        "--algorithm_name", "rmappo", "--episode_length", "6",
        "--n_rollout_threads", "4", "--num_env_steps", str(steps),
        "--ppo_epoch", "2", "--hidden_size", "32",
        "--data_chunk_length", "3", "--use_eval", "false",
        "--log_interval", "1", "--save_interval", "1", *extra,
    ])


def test_host_shared_exact_resume(tmp_path):
    d = str(tmp_path / "ck")
    # uninterrupted: 4 episodes
    env = _make_env(4)
    try:
        runner = HostSharedRunner(_aligned_cfg(96), env)
        _, hist_full = runner.run(jax.random.PRNGKey(0), log_fn=None)
    finally:
        env.close()
    # interrupted: 2 episodes, checkpoint, then resume for 2 more
    env = _make_env(4)
    try:
        runner = HostSharedRunner(_aligned_cfg(48), env)
        runner.run(jax.random.PRNGKey(0), log_fn=None, save_dir=d)
    finally:
        env.close()
    env = _make_env(4)
    try:
        runner = HostSharedRunner(
            _aligned_cfg(96, ("--model_dir", d)), env)
        _, hist_res = runner.run(jax.random.PRNGKey(0), log_fn=None)
    finally:
        env.close()

    assert [r["episode"] for r in hist_res] == [2, 3]
    for row_res in hist_res:
        row_full = next(r for r in hist_full
                        if r["episode"] == row_res["episode"])
        for k in ("value_loss", "policy_loss", "average_step_rewards",
                  "dead_ratio"):
            np.testing.assert_allclose(row_res[k], row_full[k], rtol=1e-6,
                                       err_msg=f"{k} @ep{row_res['episode']}")


def test_host_separated_exact_resume(tmp_path):
    d = str(tmp_path / "ck")

    def cfg(steps, extra=()):
        return config_from_args([
            "--algorithm_name", "happo", "--episode_length", "6",
            "--data_chunk_length", "3", "--n_rollout_threads", "4",
            "--num_env_steps", str(steps), "--ppo_epoch", "2",
            "--hidden_size", "32", "--log_interval", "1",
            "--save_interval", "1", *extra,
        ])

    env = _make_env(4)
    try:
        runner = HostSeparatedRunner(cfg(96), env)
        _, hist_full = runner.run(jax.random.PRNGKey(0), log_fn=None)
    finally:
        env.close()
    env = _make_env(4)
    try:
        runner = HostSeparatedRunner(cfg(48), env)
        runner.run(jax.random.PRNGKey(0), log_fn=None, save_dir=d)
    finally:
        env.close()
    env = _make_env(4)
    try:
        runner = HostSeparatedRunner(cfg(96, ("--model_dir", d)), env)
        _, hist_res = runner.run(jax.random.PRNGKey(0), log_fn=None)
    finally:
        env.close()

    assert [r["episode"] for r in hist_res] == [2, 3]
    for row_res in hist_res:
        row_full = next(r for r in hist_full
                        if r["episode"] == row_res["episode"])
        for k in ("agent0/value_loss", "agent1/policy_loss",
                  "average_step_rewards"):
            np.testing.assert_allclose(row_res[k], row_full[k], rtol=1e-6,
                                       err_msg=f"{k} @ep{row_res['episode']}")
