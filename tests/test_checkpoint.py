"""Checkpoint round-trip: full TrainState (params + optimizer + vnorm)
must restore exactly and resume producing identical updates."""
import numpy as np
import jax
import jax.numpy as jnp

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner
from onpolicy_tpu.utils import checkpoint as ckpt


def test_roundtrip_exact(tmp_path):
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
        "--n_rollout_threads", "4", "--episode_length", "10",
        "--num_env_steps", "400", "--ppo_epoch", "2", "--hidden_size", "32",
    ])
    runner = SharedRunner(cfg)
    ts, carry = runner.init(jax.random.PRNGKey(0))
    ts, carry, _ = runner._episode_fn(ts, carry, jax.random.PRNGKey(1))

    key = jax.random.PRNGKey(7)
    ckpt.save(tmp_path, ts, step=3, key=key)
    template = runner.algo.init_state(jax.random.PRNGKey(99))
    restored, step, rkey = ckpt.restore(tmp_path, template, key=key)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(rkey), np.asarray(key))

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ts)),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming produces identical updates to never having checkpointed
    restored_dev = jax.tree_util.tree_map(jnp.asarray, restored)
    ts1, _, m1 = runner._episode_fn(ts, carry, jax.random.PRNGKey(2))
    ts2, _, m2 = runner._episode_fn(restored_dev, carry,
                                    jax.random.PRNGKey(2))
    for a, b in zip(jax.tree_util.tree_leaves(ts1.actor_params),
                    jax.tree_util.tree_leaves(ts2.actor_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_latest_pointer(tmp_path):
    cfg = config_from_args(["--hidden_size", "32", "--episode_length", "10",
                            "--n_rollout_threads", "4"])
    runner = SharedRunner(cfg)
    ts, _ = runner.init(jax.random.PRNGKey(0))
    ckpt.save(tmp_path, ts, step=1)
    ckpt.save(tmp_path, ts, step=5)
    assert ckpt.latest_path(tmp_path).name == "ckpt_5.msgpack"


def test_exact_resume_continues_run(tmp_path):
    """A resumed run must replay the tail of an uninterrupted run exactly:
    same episode numbering, identical params (carry + RNG round-trip)."""
    args = [
        "--algorithm_name", "mappo", "--scenario_name", "simple_spread",
        "--n_rollout_threads", "4", "--episode_length", "10",
        "--ppo_epoch", "2", "--hidden_size", "32",
        "--save_interval", "1", "--log_interval", "1",
        "--use_eval", "--eval_interval", "1",
        "--n_eval_rollout_threads", "2",
    ]
    from onpolicy_tpu.envs.mpe import make_vec_env
    # uninterrupted: 4 episodes (with eval on, so the eval key split is
    # part of the replayed sequence)
    cfg_full = config_from_args(args + ["--num_env_steps", "160"])
    full = SharedRunner(cfg_full, eval_env=make_vec_env(cfg_full, n_envs=2))
    ts_full, hist_full = full.run(jax.random.PRNGKey(3), log_fn=None,
                                  save_dir=tmp_path / "full")

    # first half: 2 episodes, checkpointing
    cfg_a = config_from_args(args + ["--num_env_steps", "80"])
    ra = SharedRunner(cfg_a, eval_env=make_vec_env(cfg_a, n_envs=2))
    ra.run(jax.random.PRNGKey(3), log_fn=None, save_dir=tmp_path / "half")

    # resume to 4 episodes from the checkpoint
    cfg_b = config_from_args(args + ["--num_env_steps", "160",
                                     "--model_dir", str(tmp_path / "half")])
    rb = SharedRunner(cfg_b, eval_env=make_vec_env(cfg_b, n_envs=2))
    ts_res, hist_res = rb.run(jax.random.PRNGKey(3), log_fn=None)

    assert hist_res[0]["episode"] >= 2      # numbering continued
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.device_get(ts_full.actor_params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(ts_res.actor_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
