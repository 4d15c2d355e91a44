"""Algorithm-variant coverage: MAT, mat_dec, separated MAPPO/rMAPPO,
HAPPO sequential-factor update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.separated_runner import SeparatedRunner
from onpolicy_tpu.runner.shared_runner import SharedRunner


def _cfg(algo, scenario="simple_spread", **kw):
    args = [
        "--algorithm_name", algo,
        "--scenario_name", scenario,
        "--n_rollout_threads", "4",
        "--episode_length", "10",
        "--num_env_steps", "400",
        "--ppo_epoch", "2",
        "--hidden_size", "32",
        "--n_embd", "32",
        "--data_chunk_length", "5",
    ]
    for k, v in kw.items():
        args += [f"--{k}", str(v)]
    return config_from_args(args)


@pytest.mark.parametrize("algo", ["mat", "mat_dec"])
def test_mat_episode(algo):
    runner = SharedRunner(_cfg(algo))
    ts, carry = runner.init(jax.random.PRNGKey(0))
    ts2, carry, m = runner._episode_fn(ts, carry, jax.random.PRNGKey(1))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_mat_autoregressive_feeds_previous_actions():
    """Decoder must condition agent i's logits on agents <i actions:
    logp of the sampled joint action under parallel_act equals the
    autoregressive logp."""
    from onpolicy_tpu.models import transformer as tfm
    mcfg = tfm.MATConfig(3, 5, 1, 32, 1)
    params = tfm.mat_init(jax.random.PRNGKey(0), 6, 5, 3, 1, 32)
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 6))
    actions, logp_ar, values = tfm.autoregressive_act(
        mcfg, params, obs, jax.random.PRNGKey(2))
    logp_par, v2, ent = tfm.parallel_act(mcfg, params, obs, actions)
    np.testing.assert_allclose(np.asarray(logp_ar), np.asarray(logp_par),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(values), np.asarray(v2), rtol=1e-5)


@pytest.mark.parametrize("algo", ["mappo", "rmappo"])
def test_separated_runner(algo):
    cfg = _cfg(algo, scenario="simple_speaker_listener", num_agents=2,
               share_policy="false")
    runner = SeparatedRunner(cfg)
    states, carry = runner.init(jax.random.PRNGKey(0))
    states, carry, m = runner._episode_fn(states, carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["average_episode_rewards"]))
    assert np.isfinite(float(m["agent0"]["value_loss"]))
    assert np.isfinite(float(m["agent1"]["policy_loss"]))


def test_happo_factor_changes_updates():
    cfg = _cfg("happo")
    runner = SeparatedRunner(cfg)
    assert runner.is_happo
    states, carry = runner.init(jax.random.PRNGKey(0))
    s1, _, m1 = runner._episode_fn(states, carry, jax.random.PRNGKey(1),
                                   order=(0, 1, 2))
    s2, _, m2 = runner._episode_fn(states, carry, jax.random.PRNGKey(1),
                                   order=(2, 1, 0))
    # same data, different agent order → different updates for agent 0
    # (first in one order, last in the other — factor differs)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1[0].actor_params, s2[0].actor_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    for k, v in m1["agent0"].items():
        assert np.isfinite(float(v)), k


def test_hatrpo_trust_region():
    """HATRPO: update must keep KL below threshold and improve surrogate
    (or keep old params)."""
    cfg = _cfg("hatrpo")
    runner = SeparatedRunner(cfg)
    states, carry = runner.init(jax.random.PRNGKey(0))
    states, carry, m = runner._episode_fn(states, carry, jax.random.PRNGKey(1),
                                          order=(0, 1, 2))
    for i in range(3):
        kl = float(m[f"agent{i}"]["kl"])
        acc = float(m[f"agent{i}"]["accepted"])
        assert np.isfinite(kl)
        if acc > 0:
            assert kl < cfg.kl_threshold
            assert float(m[f"agent{i}"]["loss_improve"]) > 0


def test_mat_encode_state():
    """encode_state: the MAT encoder consumes the centralized state (the
    reference's version zeroes state, making its flag dead — ours works)."""
    cfg = _cfg("mat", encode_state="true")
    runner = SharedRunner(cfg)
    assert runner.algo.critic_reads == "share_obs"
    ts, carry = runner.init(jax.random.PRNGKey(0))
    ts2, carry, m = runner._episode_fn(ts, carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["value_loss"]))
    # encoder embed width matches the centralized state dim
    w = ts2.params["encoder"]["obs_embed"]["w"]
    assert w.shape[0] == 18 * 3  # share dim for spread (3 agents x 18)
