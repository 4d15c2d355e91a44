"""Buffer layout + sampler tests (shared_buffer.py generator parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onpolicy_tpu import buffer as bl

T, N, M = 8, 4, 3


def _buf():
    key = jax.random.PRNGKey(0)
    b = bl.init_buffer(T, N, M, obs_dim=6, share_obs_dim=18, act_dim=1,
                       logp_dim=1, recurrent_N=1, hidden_size=8)
    # fill with identifiable values: flat index over [T, N, M]
    ids = jnp.arange(T * N * M, dtype=jnp.float32).reshape(T, N, M, 1)
    b = b.replace(
        rewards=ids,
        returns=ids + 0.5,
        advantages=ids + 0.25,
        actions=ids,
        action_log_probs=ids,
        obs=jnp.broadcast_to(
            jnp.arange((T + 1) * N * M, dtype=jnp.float32
                       ).reshape(T + 1, N, M, 1), (T + 1, N, M, 6)).copy(),
    )
    return b


def test_feed_forward_partition():
    b = _buf()
    mbs = bl.feed_forward_minibatches(b, b.advantages, jax.random.PRNGKey(1), 4)
    assert mbs["obs"].shape == (4, T * N * M // 4, 6)
    # permutation covers every element exactly once
    seen = np.sort(np.asarray(mbs["actions"]).reshape(-1))
    np.testing.assert_array_equal(seen, np.arange(T * N * M))


def test_recurrent_chunks_are_time_contiguous():
    b = _buf()
    L = 4
    mbs = bl.recurrent_minibatches(b, b.advantages, jax.random.PRNGKey(2),
                                   2, L)
    # [nmb, L, mb, 1]
    assert mbs["actions"].shape == (2, L, T * N * M // L // 2, 1)
    acts = np.asarray(mbs["actions"])
    # within each chunk, consecutive steps differ by N*M (time-major ids)
    diffs = np.diff(acts, axis=1)
    assert (diffs == N * M).all(), "chunks are not time-contiguous"
    # rnn state has no L axis (taken at chunk start)
    assert mbs["rnn_states"].shape == (2, T * N * M // L // 2, 1, 8)
    # all chunks seen exactly once
    seen = np.sort(acts.reshape(-1))
    np.testing.assert_array_equal(seen, np.arange(T * N * M))


def test_naive_recurrent_full_episodes():
    b = _buf()
    mbs = bl.naive_recurrent_minibatches(b, b.advantages,
                                         jax.random.PRNGKey(3), 2)
    assert mbs["actions"].shape == (2, T, N * M // 2, 1)
    acts = np.asarray(mbs["actions"])
    assert (np.diff(acts, axis=1) == N * M).all()


def test_transformer_keeps_agent_axis():
    b = _buf()
    mbs = bl.transformer_minibatches(b, b.advantages, jax.random.PRNGKey(4), 2)
    assert mbs["obs"].shape == (2, T * N // 2, M, 6)
    assert mbs["actions"].shape == (2, T * N // 2, M, 1)


def test_from_rollout_layout():
    ids = jnp.arange(T, dtype=jnp.float32)
    mk = lambda d: jnp.broadcast_to(
        ids[:, None, None, None], (T, N, M, d)).copy()
    traj = {
        "share_obs": mk(5), "obs": mk(3), "rnn_states": mk(1)[..., None],
        "rnn_states_critic": mk(1)[..., None], "actions": mk(1),
        "action_log_probs": mk(1), "value_preds": mk(1), "rewards": mk(1),
        "masks": mk(1), "active_masks": mk(1),
    }
    last = {k: jnp.full_like(v[0], 99.0) for k, v in traj.items()
            if k not in ("actions", "action_log_probs", "value_preds",
                         "rewards")}
    b = bl.from_rollout(traj, last)
    assert b.obs.shape == (T + 1, N, M, 3)
    assert float(b.obs[T, 0, 0, 0]) == 99.0
    assert float(b.obs[3, 0, 0, 0]) == 3.0      # slot t = input of step t
    assert b.value_preds.shape == (T + 1, N, M, 1)
    assert float(b.masks[T, 0, 0, 0]) == 99.0


def test_compute_returns_integration():
    b = _buf()
    b = b.replace(rewards=jnp.ones((T, N, M, 1)))
    nv = jnp.zeros((N, M, 1))
    b2 = b.compute_returns(nv, None, gamma=0.5, gae_lambda=1.0)
    # all-ones rewards, zero values: returns_t = sum_{k>=t} 0.5^(k-t)
    expect_0 = sum(0.5 ** k for k in range(T))
    np.testing.assert_allclose(float(b2.returns[0, 0, 0, 0]), expect_0,
                               rtol=1e-5)
