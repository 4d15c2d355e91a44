"""Device-resident rollout buffer (SharedReplayBuffer parity).

Re-derivation of `/root/reference/onpolicy/utils/shared_buffer.py` as a
pytree of time-major `[T(+1), N, M, ...]` jnp arrays (N = rollout
threads, M = agents). The reference fills numpy slots with per-step
`insert` copies on host; here the rollout `lax.scan` produces the whole
buffer on device in one shot (`from_rollout`). The host-ingestion path
stages per-step numpy blocks and builds the buffer with the same
`from_rollout` at episode end (one transfer per episode).

The reference's three generators become pure index-permutation functions
that materialize `[num_mini_batch, ...]` stacked minibatches for a
`lax.scan` over updates — static shapes, `jax.random.permutation`
instead of `torch.randperm`:

  * `feed_forward_minibatches`   (shared_buffer.py:340-400)
  * `recurrent_minibatches`      — chunked BPTT, data_chunk_length
    windows, hidden state at chunk start (shared_buffer.py:499-608)
  * `naive_recurrent_minibatches` (shared_buffer.py:402-497)
  * `transformer_minibatches`    — keeps the agent axis intact
    (shared_buffer.py:264-338)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from onpolicy_tpu.ops import gae as gae_ops
from onpolicy_tpu.ops import valuenorm as vn


@struct.dataclass
class RolloutBuffer:
    share_obs: jax.Array          # [T+1, N, M, Ds]
    obs: jax.Array                # [T+1, N, M, Do]
    rnn_states: jax.Array         # [T+1, N, M, L, H]
    rnn_states_critic: jax.Array  # [T+1, N, M, L, H]
    actions: jax.Array            # [T, N, M, A]
    action_log_probs: jax.Array   # [T, N, M, Alp]
    value_preds: jax.Array        # [T+1, N, M, 1]
    rewards: jax.Array            # [T, N, M, 1]
    masks: jax.Array              # [T+1, N, M, 1]
    bad_masks: jax.Array          # [T+1, N, M, 1]
    active_masks: jax.Array       # [T+1, N, M, 1]
    available_actions: Optional[jax.Array] = None  # [T+1, N, M, n_act]
    returns: Optional[jax.Array] = None            # [T, N, M, 1]
    advantages: Optional[jax.Array] = None         # [T, N, M, 1]

    # ---- shape helpers ------------------------------------------------
    @property
    def T(self):
        return self.rewards.shape[0]

    @property
    def n_rollout_threads(self):
        return self.rewards.shape[1]

    @property
    def num_agents(self):
        return self.rewards.shape[2]

    def compute_returns(self, next_value: jax.Array,
                        norm_state: Optional[vn.ValueNormState], *, gamma,
                        gae_lambda, use_gae=True,
                        use_proper_time_limits=False) -> "RolloutBuffer":
        """GAE / discounted returns over the whole buffer
        (base_runner.compute + shared_buffer.compute_returns)."""
        value_preds = self.value_preds.at[-1].set(next_value)
        returns, advantages = gae_ops.compute_returns(
            self.rewards, value_preds, self.masks, self.bad_masks,
            norm_state, gamma=gamma, gae_lambda=gae_lambda, use_gae=use_gae,
            use_proper_time_limits=use_proper_time_limits)
        return self.replace(value_preds=value_preds, returns=returns,
                            advantages=advantages)


def init_buffer(T: int, N: int, M: int, *, obs_dim: int, share_obs_dim: int,
                act_dim: int, logp_dim: int, recurrent_N: int,
                hidden_size: int, n_avail: Optional[int] = None
                ) -> RolloutBuffer:
    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    return RolloutBuffer(
        share_obs=z(T + 1, N, M, share_obs_dim),
        obs=z(T + 1, N, M, obs_dim),
        rnn_states=z(T + 1, N, M, recurrent_N, hidden_size),
        rnn_states_critic=z(T + 1, N, M, recurrent_N, hidden_size),
        actions=z(T, N, M, act_dim),
        action_log_probs=z(T, N, M, logp_dim),
        value_preds=z(T + 1, N, M, 1),
        rewards=z(T, N, M, 1),
        masks=jnp.ones((T + 1, N, M, 1), jnp.float32),
        bad_masks=jnp.ones((T + 1, N, M, 1), jnp.float32),
        active_masks=jnp.ones((T + 1, N, M, 1), jnp.float32),
        available_actions=(jnp.ones((T + 1, N, M, n_avail), jnp.float32)
                           if n_avail else None),
    )


def from_rollout(traj: dict, last: dict) -> RolloutBuffer:
    """Assemble a [T+1]-slotted buffer from rollout-scan outputs.

    `traj` holds, for each step t=0..T-1, the step's *inputs*
    (share_obs/obs/rnn_states/rnn_states_critic/masks/active_masks
    [/available_actions/bad_masks]) and its *products*
    (actions/action_log_probs/value_preds/rewards), each stacked [T, ...]
    by `lax.scan`. `last` holds the final carry values (slot T). This
    reproduces the reference insert layout (obs at t+1 is the obs
    *after* step t, shared_buffer.py:90-123) with zero copies on device.
    """
    cat = lambda k: jnp.concatenate([traj[k], last[k][None]], 0)
    ones_tail = jnp.ones_like(traj["masks"])
    bad = traj.get("bad_masks", ones_tail)
    last_bad = last.get("bad_masks", jnp.ones_like(last["masks"]))
    return RolloutBuffer(
        share_obs=cat("share_obs"),
        obs=cat("obs"),
        rnn_states=cat("rnn_states"),
        rnn_states_critic=cat("rnn_states_critic"),
        actions=traj["actions"],
        action_log_probs=traj["action_log_probs"],
        value_preds=jnp.concatenate(
            [traj["value_preds"], jnp.zeros_like(traj["value_preds"][:1])], 0),
        rewards=traj["rewards"],
        masks=cat("masks"),
        bad_masks=jnp.concatenate([bad, last_bad[None]], 0),
        active_masks=cat("active_masks"),
        available_actions=(cat("available_actions")
                           if traj.get("available_actions") is not None
                           else None),
    )


# ====================================================================
# Minibatch samplers
# ====================================================================

def _train_fields(buf: RolloutBuffer) -> dict:
    """The per-step training arrays, flattened views [T, N, M, ...]."""
    d = {
        "share_obs": buf.share_obs[:-1],
        "obs": buf.obs[:-1],
        "rnn_states": buf.rnn_states[:-1],
        "rnn_states_critic": buf.rnn_states_critic[:-1],
        "actions": buf.actions,
        "old_action_log_probs": buf.action_log_probs,
        "value_preds": buf.value_preds[:-1],
        "returns": buf.returns,
        "masks": buf.masks[:-1],
        "active_masks": buf.active_masks[:-1],
        "advantages": buf.advantages,
    }
    if buf.available_actions is not None:
        d["available_actions"] = buf.available_actions[:-1]
    return d


def feed_forward_minibatches(buf: RolloutBuffer, advantages: jax.Array,
                             key: jax.Array, num_mini_batch: int,
                             factor: Optional[jax.Array] = None) -> dict:
    """Flatten T·N·M and split a random permutation into equal minibatches.
    Returns a dict pytree with leading axis [num_mini_batch, mb_size]."""
    d = _train_fields(buf)
    d["advantages"] = advantages
    if factor is not None:
        d["factor"] = factor
    T, N, M = buf.T, buf.n_rollout_threads, buf.num_agents
    total = T * N * M
    assert total % num_mini_batch == 0, (
        f"batch {total} not divisible by num_mini_batch {num_mini_batch}")
    if num_mini_batch == 1:
        # The single minibatch is the whole batch; a permutation is a
        # semantic no-op for the mean-reduced PPO losses but costs a
        # full random gather of every training array (the round-1 perf
        # bottleneck: ~0.4 GB × fields × epochs of HBM scatter traffic).
        return jax.tree_util.tree_map(
            lambda x: x.reshape(1, total, *x.shape[3:]), d)
    perm = jax.random.permutation(key, total)
    idx = perm.reshape(num_mini_batch, total // num_mini_batch)

    def take(x):
        flat = x.reshape(total, *x.shape[3:])
        return flat[idx]
    return jax.tree_util.tree_map(take, d)


def transformer_minibatches(buf: RolloutBuffer, advantages: jax.Array,
                            key: jax.Array, num_mini_batch: int,
                            factor: Optional[jax.Array] = None) -> dict:
    """MAT sampler: batch = T·N, agent axis kept intact
    (`feed_forward_generator_transformer`; agent shuffling is a no-op in
    the reference, shared_buffer.py:15-19)."""
    d = _train_fields(buf)
    d["advantages"] = advantages
    if factor is not None:
        d["factor"] = factor
    T, N, M = buf.T, buf.n_rollout_threads, buf.num_agents
    total = T * N
    assert total % num_mini_batch == 0
    if num_mini_batch == 1:
        return jax.tree_util.tree_map(
            lambda x: x.reshape(1, total, M, *x.shape[3:]), d)
    perm = jax.random.permutation(key, total)
    idx = perm.reshape(num_mini_batch, total // num_mini_batch)

    def take(x):
        flat = x.reshape(total, M, *x.shape[3:])
        return flat[idx]
    return jax.tree_util.tree_map(take, d)


def recurrent_minibatches(buf: RolloutBuffer, advantages: jax.Array,
                          key: jax.Array, num_mini_batch: int,
                          data_chunk_length: int,
                          factor: Optional[jax.Array] = None) -> dict:
    """Chunked-BPTT sampler (`recurrent_generator`).

    Reorders to env-major [N, M, T, ...] (matching `_cast`,
    shared_buffer.py:11-12), slices contiguous L-step windows, permutes
    chunks, and returns [num_mini_batch, L, chunk_bs, ...] sequences with
    rnn states from each chunk's first step. Sequence-major layout (L
    before batch) feeds the GRU scan directly — vs. the reference's
    [L·batch] flattening."""
    d = _train_fields(buf)
    d["advantages"] = advantages
    if factor is not None:
        d["factor"] = factor
    T, N, M = buf.T, buf.n_rollout_threads, buf.num_agents
    L = data_chunk_length
    # Chunking follows the reference exactly: episodes are laid out
    # env-major ([N,M,T] order, `_cast`) and the FLAT N·M·T stream is cut
    # into L-step windows, dropping the remainder (`data_chunks =
    # batch_size // L`, shared_buffer.py:524). When T % L != 0 (e.g. the
    # paper's spread config: T=25, L=10) chunks CROSS episode boundaries
    # — a reference quirk preserved for parity (mask gating limits the
    # leakage to the rare boundary chunks).
    n_chunks = (T * N * M) // L
    assert n_chunks % num_mini_batch == 0, (
        f"{n_chunks} chunks not divisible by num_mini_batch "
        f"{num_mini_batch}")
    mb = n_chunks // num_mini_batch

    def to_chunks(x):
        # [T,N,M,...] → [N,M,T,...] → flat stream → [n_chunks, L, ...]
        y = jnp.moveaxis(x, 0, 2).reshape(N * M * T, *x.shape[3:])
        return y[:n_chunks * L].reshape(n_chunks, L, *x.shape[3:])

    # rnn fields: only the CHUNK-START state is consumed — gather those
    # T·N·M/L rows straight from the [T,N,M,...] layout instead of
    # transposing the full [T,N,M,recurrent_N,H] arrays (at bench shapes
    # that transpose was ~630 MB of pure waste per epoch).
    starts = jnp.arange(n_chunks) * L          # flat env-major positions
    t_idx = starts % T
    rem = starts // T
    m_idx = rem % M
    n_idx = rem // M

    def start_states(x):
        return x[t_idx, n_idx, m_idx]          # [n_chunks, ...]

    if num_mini_batch == 1:
        idx = None  # whole batch in one minibatch: chunk order irrelevant
    else:
        perm = jax.random.permutation(key, n_chunks)
        idx = perm.reshape(num_mini_batch, mb)

    out = {}
    for k, x in d.items():
        if k in ("rnn_states", "rnn_states_critic"):
            h0 = start_states(x)               # [n_chunks, ...]
            out[k] = h0[None] if idx is None else h0[idx]
            continue
        chunks = to_chunks(x)
        chunks = (chunks[None] if idx is None else chunks[idx])  # [nmb,mb,L,..]
        out[k] = jnp.swapaxes(chunks, 1, 2)  # [nmb, L, mb, ...]
    return out


def naive_recurrent_minibatches(buf: RolloutBuffer, advantages: jax.Array,
                                key: jax.Array, num_mini_batch: int,
                                factor: Optional[jax.Array] = None) -> dict:
    """Whole-episode sampler (`naive_recurrent_generator`): batch over the
    N·M env-agent sequences, full T length, initial rnn state from t=0.
    Returns [num_mini_batch, T, mb, ...]."""
    d = _train_fields(buf)
    d["advantages"] = advantages
    if factor is not None:
        d["factor"] = factor
    T, N, M = buf.T, buf.n_rollout_threads, buf.num_agents
    total = N * M
    assert total % num_mini_batch == 0
    if num_mini_batch == 1:
        idx = None
    else:
        perm = jax.random.permutation(key, total)
        idx = perm.reshape(num_mini_batch, total // num_mini_batch)

    out = {}
    for k, x in d.items():
        seq = x.reshape(T, total, *x.shape[3:])
        # [T, nmb, mb, ...]
        picked = seq[:, None] if idx is None else seq[:, idx]
        if k in ("rnn_states", "rnn_states_critic"):
            out[k] = picked[0]                # [nmb, mb, ...]
        else:
            out[k] = jnp.moveaxis(picked, 1, 0)
    return out
