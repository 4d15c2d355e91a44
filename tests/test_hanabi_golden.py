"""Bit-level golden tests of the Hanabi C++ engine against the reference
HLE (`/root/reference/onpolicy/envs/hanabi/hanabi_lib/`).

Both engines replay the SAME games in lockstep: the reference deals via
its chance mechanism; every dealt card is read back from its move
history and the identical deal order is injected into our engine as a
preset deck (`State::ResetWithDeck`). After every player move (with
deals settled) the test asserts bit-for-bit equality of

  * the canonical observation encoding from every seat
    (`canonical_encoders.cc:Encode`),
  * the own-hand encoding (the repo's centralized-critic extension,
    `canonical_encoders.cc:549-596`),
  * the legal-move mask (uid enumerations match 1:1,
    `hanabi_game.cc:GetMoveUid`),
  * scalar state: current player, score, deck size, info/life tokens,
    terminal flag.

A mis-ordered encoder section, wrong knowledge update, or endgame
off-by-one fails immediately. The reference library is compiled from
the read-only reference sources into a temp dir at session scope.
"""
from __future__ import annotations

import ctypes
import random
import subprocess
from pathlib import Path

import numpy as np
import pytest

REF_DIR = Path("/root/reference/onpolicy/envs/hanabi")
BUILD_DIR = Path("/tmp/ref_hanabi_golden")

i8p = ctypes.POINTER(ctypes.c_int8)
f32p = ctypes.POINTER(ctypes.c_float)


# ---------------------------------------------------------------------
# Reference library: build + minimal ctypes surface
# ---------------------------------------------------------------------

class _PtrStruct(ctypes.Structure):
    _fields_ = [("ptr", ctypes.c_void_p)]


class _Card(ctypes.Structure):
    _fields_ = [("color", ctypes.c_int), ("rank", ctypes.c_int)]


def _build_ref_lib() -> Path:
    so = BUILD_DIR / "libpyhanabi_ref.so"
    if so.exists():
        return so
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    srcs = sorted(str(p) for p in (REF_DIR / "hanabi_lib").glob("*.cc"))
    srcs.append(str(REF_DIR / "pyhanabi.cc"))
    subprocess.run(
        ["g++", "-O2", "-std=c++11", "-fPIC", "-shared",
         "-I", str(REF_DIR), "-I", str(REF_DIR / "hanabi_lib"),
         "-o", str(so)] + srcs,
        check=True, capture_output=True)
    return so


class RefGame:
    """Reference HLE game + state driven through its C API."""

    def __init__(self, lib, *, colors, ranks, players, hand_size,
                 max_info, max_life, minimal=False, seed=1234):
        self.lib = lib
        params = {
            "players": players, "colors": colors, "ranks": ranks,
            "hand_size": hand_size, "max_information_tokens": max_info,
            "max_life_tokens": max_life,
            "observation_type": 0 if minimal else 1,
            "random_start_player": 0, "seed": seed,
        }
        flat = []
        for k, v in params.items():
            flat += [k.encode(), str(v).encode()]
        arr = (ctypes.c_char_p * len(flat))(*flat)
        self.game = _PtrStruct()
        lib.NewGame(ctypes.byref(self.game), len(flat), arr)
        self.players = players
        self.max_moves = lib.MaxMoves(ctypes.byref(self.game))

        self.encoder = _PtrStruct()
        lib.NewObservationEncoder(ctypes.byref(self.encoder),
                                  ctypes.byref(self.game), 0)  # kCanonical
        self.obs_dim = self._parse_shape(
            lib.ObservationShape(ctypes.byref(self.encoder)))
        self.ownhand_dim = self._parse_shape(
            lib.OwnHandShape(ctypes.byref(self.encoder)))

        self.state = _PtrStruct()
        lib.NewState(ctypes.byref(self.game), ctypes.byref(self.state))
        self.deals: list[tuple[int, int]] = []  # (color, rank) draw order
        self._settle_deals()

    def _parse_shape(self, cptr) -> int:
        s = ctypes.cast(cptr, ctypes.c_char_p).value.decode()
        self.lib.DeleteString(cptr)
        dims = [int(x) for x in s.split(",")]
        assert len(dims) == 1
        return dims[0]

    def _settle_deals(self):
        """Apply chance deals until a player acts; record dealt cards."""
        lib = self.lib
        while (lib.StateCurPlayer(ctypes.byref(self.state)) == -1
               and not self.terminal()):
            n_before = lib.StateLenMoveHistory(ctypes.byref(self.state))
            lib.StateDealRandomCard(ctypes.byref(self.state))
            item = _PtrStruct()
            lib.StateGetMoveHistory(ctypes.byref(self.state), n_before,
                                    ctypes.byref(item))
            move = _PtrStruct()
            lib.HistoryItemMove(ctypes.byref(item), ctypes.byref(move))
            self.deals.append((lib.MoveColor(ctypes.byref(move)),
                               lib.MoveRank(ctypes.byref(move))))
            lib.DeleteMove(ctypes.byref(move))
            lib.DeleteHistoryItem(ctypes.byref(item))

    def cur_player(self) -> int:
        return self.lib.StateCurPlayer(ctypes.byref(self.state))

    def terminal(self) -> bool:
        return self.lib.StateEndOfGameStatus(ctypes.byref(self.state)) != 0

    def score(self) -> int:
        return self.lib.StateScore(ctypes.byref(self.state))

    def deck_size(self) -> int:
        return self.lib.StateDeckSize(ctypes.byref(self.state))

    def info_tokens(self) -> int:
        return self.lib.StateInformationTokens(ctypes.byref(self.state))

    def life_tokens(self) -> int:
        return self.lib.StateLifeTokens(ctypes.byref(self.state))

    def legal_uids(self) -> list[int]:
        lib = self.lib
        ml = lib.StateLegalMoves(ctypes.byref(self.state))
        uids = []
        move = _PtrStruct()
        for i in range(lib.NumMoves(ml)):
            lib.GetMove(ml, i, ctypes.byref(move))
            uids.append(lib.GetMoveUid(ctypes.byref(self.game),
                                       ctypes.byref(move)))
        lib.DeleteMoveList(ml)
        return uids

    def apply(self, uid: int):
        move = _PtrStruct()
        self.lib.GetMoveByUid(ctypes.byref(self.game), uid,
                              ctypes.byref(move))
        self.lib.StateApplyMove(ctypes.byref(self.state), ctypes.byref(move))
        self.lib.DeleteMove(ctypes.byref(move))
        self._settle_deals()

    def _encode_with(self, fn, player: int, dim: int) -> np.ndarray:
        obs = _PtrStruct()
        self.lib.NewObservation(ctypes.byref(self.state), player,
                                ctypes.byref(obs))
        cptr = fn(ctypes.byref(self.encoder), ctypes.byref(obs))
        s = ctypes.cast(cptr, ctypes.c_char_p).value.decode()
        self.lib.DeleteString(cptr)
        self.lib.DeleteObservation(ctypes.byref(obs))
        vec = np.array([int(x) for x in s.split(",")], dtype=np.float32)
        assert vec.shape == (dim,)
        return vec

    def encode(self, player: int) -> np.ndarray:
        return self._encode_with(self.lib.EncodeObservation, player,
                                 self.obs_dim)

    def encode_ownhand(self, player: int) -> np.ndarray:
        return self._encode_with(self.lib.EncodeOwnHandObservation, player,
                                 self.ownhand_dim)


def _bind_ref(lib):
    P = ctypes.POINTER(_PtrStruct)
    lib.NewGame.argtypes = [P, ctypes.c_int,
                            ctypes.POINTER(ctypes.c_char_p)]
    for name in ("MaxMoves", "StateCurPlayer", "StateEndOfGameStatus",
                 "StateScore", "StateDeckSize", "StateInformationTokens",
                 "StateLifeTokens", "StateLenMoveHistory"):
        getattr(lib, name).argtypes = [P]
        getattr(lib, name).restype = ctypes.c_int
    lib.MaxMoves.argtypes = [P]
    lib.NewState.argtypes = [P, P]
    lib.StateDealRandomCard.argtypes = [P]
    lib.StateGetMoveHistory.argtypes = [P, ctypes.c_int, P]
    lib.HistoryItemMove.argtypes = [P, P]
    lib.DeleteHistoryItem.argtypes = [P]
    lib.DeleteMove.argtypes = [P]
    for name in ("MoveColor", "MoveRank", "NumMoves"):
        getattr(lib, name).restype = ctypes.c_int
    lib.MoveColor.argtypes = [P]
    lib.MoveRank.argtypes = [P]
    lib.StateLegalMoves.argtypes = [P]
    lib.StateLegalMoves.restype = ctypes.c_void_p
    lib.NumMoves.argtypes = [ctypes.c_void_p]
    lib.GetMove.argtypes = [ctypes.c_void_p, ctypes.c_int, P]
    lib.DeleteMoveList.argtypes = [ctypes.c_void_p]
    lib.GetMoveUid.argtypes = [P, P]
    lib.GetMoveUid.restype = ctypes.c_int
    lib.GetMoveByUid.argtypes = [P, ctypes.c_int, P]
    lib.StateApplyMove.argtypes = [P, P]
    lib.NewObservationEncoder.argtypes = [P, P, ctypes.c_int]
    lib.ObservationShape.argtypes = [P]
    lib.ObservationShape.restype = ctypes.c_void_p
    lib.OwnHandShape.argtypes = [P]
    lib.OwnHandShape.restype = ctypes.c_void_p
    lib.NewObservation.argtypes = [P, ctypes.c_int, P]
    lib.DeleteObservation.argtypes = [P]
    lib.EncodeObservation.argtypes = [P, P]
    lib.EncodeObservation.restype = ctypes.c_void_p
    lib.EncodeOwnHandObservation.argtypes = [P, P]
    lib.EncodeOwnHandObservation.restype = ctypes.c_void_p
    lib.DeleteString.argtypes = [ctypes.c_void_p]
    return lib


# ---------------------------------------------------------------------
# Our engine: single-state replay surface
# ---------------------------------------------------------------------

def _rank_count(rank: int, ranks: int) -> int:
    """Copies of a rank per color (HLE deck composition)."""
    if rank == 0:
        return 3
    if rank == ranks - 1:
        return 1
    return 2


class OurGame:
    def __init__(self, lib, deals, *, colors, ranks, players, hand_size,
                 max_info, max_life, obs_dim, ownhand_dim, max_moves,
                 minimal=False):
        self.lib = lib
        self.obs_dim = obs_dim
        self.ownhand_dim = ownhand_dim
        self.max_moves = max_moves
        # Full deck = recorded deal prefix + the undealt composition in
        # arbitrary order. The suffix is never drawn before the caller
        # rebuilds with a longer prefix, but its size must be right: the
        # canonical encoding contains a deck-size thermometer.
        remaining: dict[tuple[int, int], int] = {}
        for c in range(colors):
            for r in range(ranks):
                remaining[(c, r)] = _rank_count(r, ranks)
        for cr in deals:
            remaining[cr] -= 1
            assert remaining[cr] >= 0, f"over-dealt card {cr}"
        deck = list(deals)
        for (c, r), n in sorted(remaining.items()):
            deck += [(c, r)] * n
        dc = np.array([c for c, _ in deck], dtype=np.int8)
        dr = np.array([r for _, r in deck], dtype=np.int8)
        self.h = lib.hanabi_state_new(
            colors, ranks, players, hand_size, max_info, max_life,
            int(minimal), dc.ctypes.data_as(i8p), dr.ctypes.data_as(i8p),
            len(deck))

    def close(self):
        self.lib.hanabi_state_free(self.h)

    def encode(self, player: int) -> np.ndarray:
        out = np.empty(self.obs_dim, dtype=np.float32)
        self.lib.hanabi_state_encode(self.h, player, out.ctypes.data_as(f32p))
        return out

    def encode_ownhand(self, player: int) -> np.ndarray:
        out = np.empty(self.ownhand_dim, dtype=np.float32)
        self.lib.hanabi_state_encode_ownhand(self.h, player,
                                             out.ctypes.data_as(f32p))
        return out

    def legal_mask(self, player: int) -> np.ndarray:
        out = np.empty(self.max_moves, dtype=np.float32)
        self.lib.hanabi_state_legal_mask(self.h, player,
                                         out.ctypes.data_as(f32p))
        return out


@pytest.fixture(scope="session")
def ref_lib():
    return _bind_ref(ctypes.CDLL(str(_build_ref_lib())))


@pytest.fixture(scope="session")
def our_lib():
    from onpolicy_tpu.envs.hanabi import binding
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


CONFIGS = {
    # name: (colors, ranks, players, hand_size, max_info, max_life, minimal)
    "Full-2p": (5, 5, 2, 5, 8, 3, False),
    "Full-3p": (5, 5, 3, 5, 8, 3, False),
    "Full-Minimal-2p": (5, 5, 2, 5, 8, 3, True),
    "Small-2p": (2, 5, 2, 2, 3, 1, False),
}


def _compare(ref: RefGame, ours: OurGame, where: str):
    lib = ours.lib
    assert lib.hanabi_state_cur_player(ours.h) == ref.cur_player(), where
    assert lib.hanabi_state_score(ours.h) == ref.score(), where
    assert lib.hanabi_state_deck_size(ours.h) == ref.deck_size(), where
    assert lib.hanabi_state_info_tokens(ours.h) == ref.info_tokens(), where
    assert lib.hanabi_state_life_tokens(ours.h) == ref.life_tokens(), where

    for p in range(ref.players):
        r = ref.encode(p)
        o = ours.encode(p)
        diff = np.flatnonzero(r != o)
        assert diff.size == 0, (
            f"{where}: canonical encoding differs for player {p} at bits "
            f"{diff[:16].tolist()} (ref {r[diff[:16]].tolist()} vs "
            f"ours {o[diff[:16]].tolist()})")
        r_oh = ref.encode_ownhand(p)
        o_oh = ours.encode_ownhand(p)
        diff = np.flatnonzero(r_oh != o_oh)
        assert diff.size == 0, (
            f"{where}: own-hand encoding differs for player {p} at bits "
            f"{diff[:16].tolist()}")

    cur = ref.cur_player()
    ref_mask = np.zeros(ref.max_moves, dtype=np.float32)
    ref_mask[ref.legal_uids()] = 1.0
    our_mask = ours.legal_mask(cur)
    diff = np.flatnonzero(ref_mask != our_mask)
    assert diff.size == 0, f"{where}: legal mask differs at uids {diff.tolist()}"


@pytest.mark.parametrize("name", list(CONFIGS))
def test_lockstep_replay_bit_exact(name, ref_lib, our_lib):
    colors, ranks, players, hand_size, max_info, max_life, minimal = \
        CONFIGS[name]
    rng = random.Random(hash(name) & 0xFFFF)
    games = 6 if name == "Full-2p" else 4
    for g in range(games):
        ref = RefGame(ref_lib, colors=colors, ranks=ranks, players=players,
                      hand_size=hand_size, max_info=max_info,
                      max_life=max_life, minimal=minimal, seed=1234 + g)

        def make_ours():
            return OurGame(our_lib, ref.deals, colors=colors, ranks=ranks,
                           players=players, hand_size=hand_size,
                           max_info=max_info, max_life=max_life,
                           obs_dim=ref.obs_dim, ownhand_dim=ref.ownhand_dim,
                           max_moves=ref.max_moves, minimal=minimal)

        ours = make_ours()
        # Our engine needs the not-yet-dealt cards in the deck for correct
        # deck_size and draws. Rebuild the state whenever new deals appear:
        # cheaper and simpler — replay from scratch with the longer prefix.
        moves: list[int] = []

        def rebuild():
            nonlocal ours
            ours.close()
            o2 = make_ours()
            for uid in moves:
                our_lib.hanabi_state_apply(o2.h, uid)
            return o2

        steps = 0
        while not ref.terminal() and steps < 300:
            uid = rng.choice(ref.legal_uids())
            n_deals = len(ref.deals)
            ref.apply(uid)
            moves.append(uid)
            if len(ref.deals) != n_deals:
                ours = rebuild()
            else:
                our_lib.hanabi_state_apply(ours.h, uid)
            steps += 1
            if not ref.terminal():
                _compare(ref, ours, f"{name} game {g} step {steps}")
        # terminal agreement
        assert bool(our_lib.hanabi_state_terminal(ours.h)) == ref.terminal(), \
            f"{name} game {g}: terminal mismatch after {steps} moves"
        assert our_lib.hanabi_state_score(ours.h) == ref.score(), \
            f"{name} game {g}: final score mismatch"
        ours.close()
