"""Golden lockstep: the pure-JAX Hanabi engine vs the C++ engine.

The C++ engine is bit-exact against the reference HLE fork
(tests/test_hanabi_golden.py), so bit-matching it here gives the JAX
engine transitive bit-parity with
`/root/reference/onpolicy/envs/hanabi/hanabi_lib/`.

Both engines are reset with the SAME injected deck (draw order), then
driven with identical random legal moves; after every move the test
compares cur_player / terminal / score / reward, the full canonical
encodings and own-hand encodings for every player, and the legal-move
masks — all bit-for-bit."""
from __future__ import annotations

import ctypes

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onpolicy_tpu.envs.hanabi import jax_engine as je
from onpolicy_tpu.envs.hanabi import binding

i8p = ctypes.POINTER(ctypes.c_int8)
f32p = ctypes.POINTER(ctypes.c_float)


@pytest.fixture(scope="module")
def lib():
    lib = binding.load_library()
    lib.hanabi_state_new.restype = ctypes.c_void_p
    lib.hanabi_state_new.argtypes = [ctypes.c_int] * 7 + [i8p, i8p,
                                                          ctypes.c_int]
    lib.hanabi_state_free.argtypes = [ctypes.c_void_p]
    for name in ("hanabi_state_cur_player", "hanabi_state_terminal",
                 "hanabi_state_score", "hanabi_state_deck_size",
                 "hanabi_state_info_tokens", "hanabi_state_life_tokens"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
        getattr(lib, name).restype = ctypes.c_int
    lib.hanabi_state_legal.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hanabi_state_legal.restype = ctypes.c_int
    lib.hanabi_state_apply.argtypes = [ctypes.c_void_p, ctypes.c_int]
    for name in ("hanabi_state_encode", "hanabi_state_encode_ownhand",
                 "hanabi_state_legal_mask"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int, f32p]
    return lib


class CppState:
    def __init__(self, lib, game: je.JaxHanabiGame, deck_ids: np.ndarray):
        self.lib = lib
        self.game = game
        dc = (deck_ids // game.ranks).astype(np.int8)
        dr = (deck_ids % game.ranks).astype(np.int8)
        self.h = lib.hanabi_state_new(
            game.colors, game.ranks, game.players, game.hand_size,
            game.max_info, game.max_life, int(game.minimal),
            dc.ctypes.data_as(i8p), dr.ctypes.data_as(i8p), len(deck_ids))

    def encode(self, p):
        out = np.empty(self.game.obs_dim, np.float32)
        self.lib.hanabi_state_encode(self.h, p, out.ctypes.data_as(f32p))
        return out

    def encode_ownhand(self, p):
        out = np.empty(self.game.ownhand_dim, np.float32)
        self.lib.hanabi_state_encode_ownhand(self.h, p,
                                             out.ctypes.data_as(f32p))
        return out

    def legal_mask(self, p):
        out = np.empty(self.game.n_moves, np.float32)
        self.lib.hanabi_state_legal_mask(self.h, p,
                                         out.ctypes.data_as(f32p))
        return out

    def close(self):
        self.lib.hanabi_state_free(self.h)


CONFIGS = {
    "Full-2p": dict(colors=5, ranks=5, players=2, hand_size=5,
                    max_info=8, max_life=3, minimal=False),
    "Full-3p": dict(colors=5, ranks=5, players=3, hand_size=5,
                    max_info=8, max_life=3, minimal=False),
    "Full-Minimal-2p": dict(colors=5, ranks=5, players=2, hand_size=5,
                            max_info=8, max_life=3, minimal=True),
    "Small-2p": dict(colors=2, ranks=5, players=2, hand_size=2,
                     max_info=3, max_life=1, minimal=False),
}


def _compare(game, cpp, lib, st, where):
    assert int(st.cur_player) == lib.hanabi_state_cur_player(cpp.h), where
    assert bool(st.terminal) == bool(lib.hanabi_state_terminal(cpp.h)), where
    assert int(je.score(game, st)) == lib.hanabi_state_score(cpp.h), where
    assert int(game.deck_len - st.deck_ptr) == \
        lib.hanabi_state_deck_size(cpp.h), where
    assert int(st.info) == lib.hanabi_state_info_tokens(cpp.h), where
    assert int(st.lives) == lib.hanabi_state_life_tokens(cpp.h), where
    for p in range(game.players):
        ours = np.asarray(je.encode(game, st, jnp.asarray(p)))
        ref = cpp.encode(p)
        diff = np.flatnonzero(ours != ref)
        assert diff.size == 0, (
            f"{where}: encode(p{p}) differs at {diff[:12]} "
            f"(ours {ours[diff[:6]]}, cpp {ref[diff[:6]]})")
        np.testing.assert_array_equal(
            np.asarray(je.encode_own_hand(game, st, jnp.asarray(p))),
            cpp.encode_ownhand(p), err_msg=f"{where} ownhand p{p}")
        np.testing.assert_array_equal(
            np.asarray(je.legal_mask_for(game, st, jnp.asarray(p))),
            cpp.legal_mask(p), err_msg=f"{where} legal p{p}")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_lockstep_vs_cpp(lib, name):
    game = je.JaxHanabiGame.make(**CONFIGS[name])
    step_jit = jax.jit(lambda s, a: je.step(game, s, a))
    rng = np.random.default_rng(hash(name) % 2**31)

    for g in range(2):
        deck = rng.permutation(game.base_deck())
        st = je.reset_with_deck(game, jnp.asarray(deck))
        cpp = CppState(lib, game, deck)
        _compare(game, cpp, lib, st, f"{name} game{g} reset")
        for move_i in range(80):
            if bool(st.terminal):
                break
            mask = np.asarray(je.legal_mask(game, st))
            legal = np.flatnonzero(mask > 0)
            assert legal.size > 0, f"{name} game{g} move{move_i}: no legal"
            uid = int(rng.choice(legal))
            assert lib.hanabi_state_legal(cpp.h, uid) == 1
            before = lib.hanabi_state_score(cpp.h)
            lib.hanabi_state_apply(cpp.h, uid)
            after_terminal = lib.hanabi_state_terminal(cpp.h)
            after = lib.hanabi_state_score(cpp.h)
            st, reward = step_jit(st, jnp.asarray(uid))
            assert float(reward) == float(after - before), \
                f"{name} game{g} move{move_i} reward"
            _compare(game, cpp, lib, st,
                     f"{name} game{g} move{move_i} (uid {uid})")
            assert bool(st.terminal) == bool(after_terminal)
        cpp.close()


def test_noop_and_illegal_are_ignored():
    game = je.JaxHanabiGame.make(**CONFIGS["Small-2p"])
    st = je.reset(game, jax.random.PRNGKey(0))
    st2, r = je.step(game, st, jnp.asarray(-1))
    assert float(r) == 0.0
    np.testing.assert_array_equal(np.asarray(st2.hand_card),
                                  np.asarray(st.hand_card))
    assert int(st2.cur_player) == int(st.cur_player)
    # discard is illegal at max info tokens: uid 0 = discard slot 0
    st3, r3 = je.step(game, st, jnp.asarray(0))
    assert float(r3) == 0.0 and int(st3.cur_player) == int(st.cur_player)


def test_fleet_dims_match_cpp_env():
    """JaxHanabiFleet advertises the same spaces as the C++-backed env."""
    from onpolicy_tpu.envs.hanabi.hanabi_env import HanabiVecEnv
    from onpolicy_tpu.envs.hanabi.jax_fleet import JaxHanabiFleet
    for name in ("Hanabi-Small", "Hanabi-Full"):
        cpp = HanabiVecEnv(name, 2, 2, seed=0)
        fl = JaxHanabiFleet(name, 2, 2, seed=0)
        assert fl.obs_dim == cpp.obs_dim
        assert fl.share_dim == cpp.share_dim
        assert fl.n_moves == cpp.n_moves
        cpp.close()


def test_zero_callback_training_runs():
    """use_jax_env + use_scan_rounds: the whole episode (env stepping
    included) is one XLA program with no host callbacks; training
    produces finite losses and true-step accounting."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.hanabi_runner import HanabiRunner
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--env_name", "Hanabi",
        "--scenario_name", "Hanabi-Small", "--num_agents", "2",
        "--n_rollout_threads", "8", "--episode_length", "8",
        "--num_env_steps", "256", "--ppo_epoch", "2",
        "--hidden_size", "32", "--use_recurrent_policy", "false",
        "--use_scan_rounds", "--use_jax_env", "--log_interval", "1"])
    runner = HanabiRunner(cfg)
    ts, hist = runner.run(jax.random.PRNGKey(0), log_fn=None)
    rows = [r for r in hist if "value_loss" in r]
    assert rows and all(np.isfinite(r["value_loss"]) for r in rows)
    assert rows[-1]["true_steps"] > 0


def test_hanabi_resume_continues(tmp_path):
    """model_dir resume in HanabiRunner: weights/opt/normalizer/key are
    restored and the episode counter continues past the checkpoint."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.hanabi_runner import HanabiRunner
    d = str(tmp_path)
    args = ["--algorithm_name", "mappo", "--env_name", "Hanabi",
            "--scenario_name", "Hanabi-Small", "--num_agents", "2",
            "--n_rollout_threads", "8", "--episode_length", "8",
            "--ppo_epoch", "2", "--hidden_size", "32",
            "--use_recurrent_policy", "false",
            "--use_scan_rounds", "--use_jax_env", "--log_interval", "1"]
    r1 = HanabiRunner(config_from_args(args + ["--num_env_steps", "256"]))
    r1.run(jax.random.PRNGKey(0), log_fn=None, save_dir=d)
    r2 = HanabiRunner(config_from_args(
        args + ["--num_env_steps", "384", "--model_dir", d]))
    _, hist2 = r2.run(jax.random.PRNGKey(0), log_fn=None)
    eps = [h["episode"] for h in hist2]
    assert eps and min(eps) >= 4, eps
    assert all(np.isfinite(h["value_loss"]) for h in hist2
               if "value_loss" in h)


def test_fleet_vmap_matches_single():
    game = je.JaxHanabiGame.make(**CONFIGS["Small-2p"])
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    fleet = jax.vmap(lambda k: je.reset(game, k))(keys)
    singles = [je.reset(game, k) for k in keys]
    vstep = jax.jit(jax.vmap(lambda s, a: je.step(game, s, a)))
    rng = np.random.default_rng(0)
    for t in range(12):
        acts = []
        for s in singles:
            mask = np.asarray(je.legal_mask(game, s))
            legal = np.flatnonzero(mask > 0)
            acts.append(int(rng.choice(legal)) if legal.size and
                        not bool(s.terminal) else -1)
        fleet, rew_f = vstep(fleet, jnp.asarray(acts))
        for i in range(4):
            singles[i], r = je.step(game, singles[i], jnp.asarray(acts[i]))
            assert float(r) == float(rew_f[i])
            np.testing.assert_array_equal(
                np.asarray(je.encode(game, singles[i], jnp.asarray(0))),
                np.asarray(je.encode(
                    game, jax.tree_util.tree_map(lambda x: x[i], fleet),
                    jnp.asarray(0))), err_msg=f"fleet t{t} env{i}")


def test_onehot_select_helpers_match_indexing():
    """_sel/_sel_rows/_set_row are drop-in one-hot forms of arr[i] /
    arr[idxs] / arr.at[i].set(row) (the round-5 gather/scatter kill);
    property-check them against direct indexing over random int arrays,
    including negative values and out-of-range index clipping
    semantics (out-of-range -> zeros for _sel*, no-op for _set_row)."""
    import numpy as np
    from onpolicy_tpu.envs.hanabi import jax_engine as je

    rng = np.random.default_rng(0)
    for shape in [(2,), (5,), (2, 5), (5, 3), (2, 5, 4)]:
        arr = jnp.asarray(rng.integers(-3, 9, size=shape), jnp.int32)
        n = shape[0]
        for i in range(n):
            np.testing.assert_array_equal(
                np.asarray(je._sel(arr, jnp.int32(i))), np.asarray(arr[i]))
            row = jnp.asarray(rng.integers(-3, 9, size=shape[1:]),
                              jnp.int32)
            np.testing.assert_array_equal(
                np.asarray(je._set_row(arr, jnp.int32(i), row)),
                np.asarray(arr.at[i].set(row)))
        idxs = jnp.asarray(rng.integers(0, n, size=7), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(je._sel_rows(arr, idxs)), np.asarray(arr[idxs]))
        # out-of-range: one-hot select sums an empty mask -> zeros;
        # set_row is a no-op (used for deck_ptr == deck_len)
        np.testing.assert_array_equal(
            np.asarray(je._sel(arr, jnp.int32(n))),
            np.zeros(shape[1:], np.int32))
        np.testing.assert_array_equal(
            np.asarray(je._set_row(arr, jnp.int32(n), row * 0)),
            np.asarray(arr))
