"""Device-resident Hanabi: the full game engine as pure JAX functions.

Semantics transcribed from our C++ engine (`cpp/hanabi/hanabi.{h,cc}`),
which is itself bit-exact against the reference's vendored HLE fork
(tests/test_hanabi_golden.py) — so matching the C++ engine bit-for-bit
(tests/test_jax_hanabi.py, deck-injected lockstep) gives transitive
bit-parity with `/root/reference/onpolicy/envs/hanabi/hanabi_lib/`.

Why: the C++ fleet is host-side, so every seat round costs a
device↔host round trip (io_callback) — the dominant wall-clock cost on
a remote TPU. Here state is a pytree of small int arrays, `step` /
`encode` are jit/vmap-able, and the WHOLE training episode (rounds ×
seats × env stepping × PPO) compiles into one XLA program with zero
callbacks.

Representation (single game; fleet via vmap):
  deck        [deck_len] int8 card ids (color·R + rank) in DRAW order
  deck_ptr    ()  int32 — next card to draw
  hand_card   [P, H] int8 (−1 = empty); hand_n [P] int32
  know_color / know_rank [P, H] int32 plausibility bitmasks
  hinted_color / hinted_rank [P, H] int8 (−1 = none)
  fireworks   [C] int32; info / lives () int32
  discards    [C, R] int32 copy counts
  last_*      scalars mirroring C++ LastAction
  cur_player, final_countdown () int32; terminal () bool

Hands replicate the C++ erase-slot-then-append-draw exactly (slots
shift left, drawn card lands at the new end).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

RANK_COUNTS = (3, 2, 2, 2, 1)    # copies of each rank per color


def rank_count(rank: int) -> int:
    return RANK_COUNTS[rank]


def cards_per_color(ranks: int) -> int:
    return sum(RANK_COUNTS[:ranks])


# Move-type codes (C++ MoveType order; the ENCODER uses play/discard/
# revealC/revealR one-hot order — handled in encode)
DISCARD, PLAY, REVEAL_COLOR, REVEAL_RANK = 0, 1, 2, 3


@dataclass(frozen=True)
class JaxHanabiGame:
    """Hashable static game description + derived move tables."""
    colors: int = 5
    ranks: int = 5
    players: int = 2
    hand_size: int = 5
    max_info: int = 8
    max_life: int = 3
    minimal: bool = False

    @classmethod
    def make(cls, colors=5, ranks=5, players=2, hand_size=-1, max_info=8,
             max_life=3, minimal=False):
        if hand_size is None or hand_size <= 0:
            hand_size = 5 if players < 4 else 4
        return cls(colors, ranks, players, hand_size, max_info, max_life,
                   minimal)

    # ---- derived sizes ------------------------------------------------
    @property
    def deck_len(self) -> int:
        return self.colors * cards_per_color(self.ranks)

    @property
    def n_moves(self) -> int:
        return 2 * self.hand_size + (self.players - 1) * (self.colors
                                                          + self.ranks)

    @property
    def obs_dim(self) -> int:
        C, R, P, H = self.colors, self.ranks, self.players, self.hand_size
        hands = (P - 1) * H * C * R + P
        board = (self.deck_len - P * H) + C * R + self.max_info \
            + self.max_life
        discards = C * cards_per_color(R)
        last = P + 4 + P + C + R + H + H + C * R + 2
        knowledge = 0 if self.minimal else P * H * (C * R + C + R)
        return hands + board + discards + last + knowledge

    @property
    def ownhand_dim(self) -> int:
        return self.hand_size * self.colors * self.ranks

    # ---- static move tables (uid → fields), C++ Game::GetMove --------
    def move_tables(self):
        C, R, P, H = self.colors, self.ranks, self.players, self.hand_size
        mtype, slot, target, color, rank = [], [], [], [], []
        for uid in range(self.n_moves):
            if uid < H:
                mtype.append(DISCARD); slot.append(uid)
                target.append(0); color.append(-1); rank.append(-1)
            elif uid < 2 * H:
                mtype.append(PLAY); slot.append(uid - H)
                target.append(0); color.append(-1); rank.append(-1)
            elif uid < 2 * H + (P - 1) * C:
                k = uid - 2 * H
                mtype.append(REVEAL_COLOR); slot.append(-1)
                target.append(1 + k // C); color.append(k % C)
                rank.append(-1)
            else:
                k = uid - 2 * H - (P - 1) * C
                mtype.append(REVEAL_RANK); slot.append(-1)
                target.append(1 + k // R); color.append(-1)
                rank.append(k % R)
        as_a = lambda x: np.asarray(x, np.int32)
        return (as_a(mtype), as_a(slot), as_a(target), as_a(color),
                as_a(rank))

    def base_deck(self) -> np.ndarray:
        """Card ids of the full multiset, C++ Reset composition order."""
        ids = []
        for c in range(self.colors):
            for r in range(self.ranks):
                ids.extend([c * self.ranks + r] * rank_count(r))
        return np.asarray(ids, np.int8)


@struct.dataclass
class HanabiState:
    deck: jax.Array
    deck_ptr: jax.Array
    hand_card: jax.Array
    hand_n: jax.Array
    know_color: jax.Array
    know_rank: jax.Array
    hinted_color: jax.Array
    hinted_rank: jax.Array
    fireworks: jax.Array
    info: jax.Array
    lives: jax.Array
    discards: jax.Array
    last_acting: jax.Array       # −1 = none yet
    last_type: jax.Array         # move-type code, −1 = none
    last_target: jax.Array
    last_color: jax.Array
    last_rank: jax.Array
    last_reveal: jax.Array       # slot bitmask
    last_slot: jax.Array
    last_card: jax.Array         # card id, −1 = none
    last_success: jax.Array      # bool
    last_added_info: jax.Array   # bool
    cur_player: jax.Array
    final_countdown: jax.Array
    terminal: jax.Array


def _i32(x):
    return jnp.asarray(x, jnp.int32)


# ---------------------------------------------------------------------
# One-hot select/update helpers. A traced-index read (`arr[p]`) or write
# (`arr.at[p].set(...)`) lowers to a gather/scatter kernel under vmap;
# on TPU those cost 60-200us each at fleet width even over tiny axes
# (P=2, H=5, C=5) — the round-5 trace showed them dominating the whole
# seat round (docs/PROFILE_HANABI.md). The same math as a one-hot
# where/sum fuses into the surrounding elementwise work.
# ---------------------------------------------------------------------

def _sel(arr, idx):
    """arr[idx] along axis 0 for a traced scalar idx (int arrays)."""
    n = arr.shape[0]
    oh = (jnp.arange(n) == idx).reshape((n,) + (1,) * (arr.ndim - 1))
    return jnp.sum(jnp.where(oh, arr, jnp.zeros_like(arr)), axis=0,
                   dtype=jnp.int32)


def _sel_rows(arr, idxs):
    """arr[idxs] along axis 0 for a traced index VECTOR [K] (ints)."""
    n = arr.shape[0]
    oh = idxs[:, None] == jnp.arange(n)[None, :]          # [K, n]
    ohb = oh.reshape(oh.shape + (1,) * (arr.ndim - 1))
    return jnp.sum(jnp.where(ohb, arr[None], jnp.zeros_like(arr)[None]),
                   axis=1, dtype=jnp.int32)


def _set_row(arr, idx, row):
    """arr.at[idx].set(row) along axis 0 for a traced scalar idx."""
    n = arr.shape[0]
    oh = (jnp.arange(n) == idx).reshape((n,) + (1,) * (arr.ndim - 1))
    return jnp.where(oh, jnp.asarray(row, arr.dtype), arr)


def reset(game: JaxHanabiGame, key: jax.Array) -> HanabiState:
    """Fresh shuffled game (C++ State::Reset + DealInitialHands)."""
    deck = jax.random.permutation(key, jnp.asarray(game.base_deck()))
    return reset_with_deck(game, deck)


def reset_with_deck(game: JaxHanabiGame, deck: jax.Array) -> HanabiState:
    """Deterministic-replay reset: `deck` is the DRAW order (int8 card
    ids, length deck_len) — mirrors C++ ResetWithDeck."""
    P, H, C, R = (game.players, game.hand_size, game.colors, game.ranks)
    # initial deal: player-major, slot-minor (DealInitialHands)
    dealt = deck[:P * H].reshape(P, H).astype(jnp.int8)
    return HanabiState(
        deck=deck.astype(jnp.int8),
        deck_ptr=_i32(P * H),
        hand_card=dealt,
        hand_n=jnp.full((P,), H, jnp.int32),
        know_color=jnp.full((P, H), (1 << C) - 1, jnp.int32),
        know_rank=jnp.full((P, H), (1 << R) - 1, jnp.int32),
        hinted_color=jnp.full((P, H), -1, jnp.int32),
        hinted_rank=jnp.full((P, H), -1, jnp.int32),
        fireworks=jnp.zeros((C,), jnp.int32),
        info=_i32(game.max_info),
        lives=_i32(game.max_life),
        discards=jnp.zeros((C, R), jnp.int32),
        last_acting=_i32(-1), last_type=_i32(-1), last_target=_i32(-1),
        last_color=_i32(-1), last_rank=_i32(-1), last_reveal=_i32(0),
        last_slot=_i32(-1), last_card=_i32(-1),
        last_success=jnp.asarray(False), last_added_info=jnp.asarray(False),
        cur_player=_i32(0),
        final_countdown=_i32(P),
        terminal=jnp.asarray(False),
    )


def score(game: JaxHanabiGame, s: HanabiState) -> jax.Array:
    return jnp.where(s.lives <= 0, 0, jnp.sum(s.fireworks))


def legal_mask(game: JaxHanabiGame, s: HanabiState) -> jax.Array:
    """[n_moves] float mask of legal moves for the CURRENT player
    (zeros when terminal) — C++ LegalMovesMask(cur_player)."""
    mtype, slot, target, color, rank = [jnp.asarray(t) for t in
                                        game.move_tables()]
    P = game.players
    hand_n_cur = _sel(s.hand_n, s.cur_player)
    # discard: slot < hand size AND info below max
    ok_discard = (slot < hand_n_cur) & (s.info < game.max_info)
    # play: slot < hand size
    ok_play = slot < hand_n_cur
    # reveal: info > 0 AND target holds a matching card
    tgt = (s.cur_player + target) % P
    tgt_cards = _sel_rows(s.hand_card, tgt)            # [n_moves, H]
    valid_slot = jnp.arange(game.hand_size)[None, :] \
        < _sel_rows(s.hand_n, tgt)[:, None]
    card_color = tgt_cards // game.ranks
    card_rank = tgt_cards % game.ranks
    has_color = jnp.any(valid_slot & (card_color == color[:, None]), axis=1)
    has_rank = jnp.any(valid_slot & (card_rank == rank[:, None]), axis=1)
    ok_revc = (s.info > 0) & has_color
    ok_revr = (s.info > 0) & has_rank
    ok = jnp.select(
        [mtype == DISCARD, mtype == PLAY, mtype == REVEAL_COLOR],
        [ok_discard, ok_play, ok_revc], ok_revr)
    return jnp.where(s.terminal, 0.0, ok.astype(jnp.float32))


def _remove_and_draw(game: JaxHanabiGame, s: HanabiState, p, slot_idx):
    """Erase slot from player p's hand/knowledge, then draw (C++ erase +
    Draw): slots above shift left; the drawn card lands at the new end."""
    H, C, R = game.hand_size, game.colors, game.ranks
    n = _sel(s.hand_n, p)
    idx = jnp.arange(H)
    nxt = jnp.minimum(idx + 1, H - 1)

    def shift(row, fill):
        return jnp.where(idx >= slot_idx, row[nxt], row)

    can_draw = s.deck_ptr < game.deck_len
    drawn = jnp.where(can_draw, _sel(s.deck, s.deck_ptr), -1)
    new_n = n - 1 + can_draw.astype(jnp.int32)
    end = n - 1  # index where the drawn card lands (hand had n cards)

    def place(row, value, fill):
        row = shift(row, fill)
        row = jnp.where(idx == end, jnp.where(can_draw, value, fill), row)
        return jnp.where(idx >= new_n, fill, row)

    hand_card = _set_row(
        s.hand_card, p,
        place(_sel(s.hand_card, p), drawn, -1).astype(jnp.int8))
    know_color = _set_row(
        s.know_color, p, place(_sel(s.know_color, p), (1 << C) - 1,
                               (1 << C) - 1))
    know_rank = _set_row(
        s.know_rank, p, place(_sel(s.know_rank, p), (1 << R) - 1,
                              (1 << R) - 1))
    hinted_color = _set_row(
        s.hinted_color, p, place(_sel(s.hinted_color, p), -1, -1))
    hinted_rank = _set_row(
        s.hinted_rank, p, place(_sel(s.hinted_rank, p), -1, -1))
    return s.replace(hand_card=hand_card,
                     hand_n=_set_row(s.hand_n, p, new_n),
                     know_color=know_color, know_rank=know_rank,
                     hinted_color=hinted_color, hinted_rank=hinted_rank,
                     deck_ptr=s.deck_ptr + can_draw.astype(jnp.int32))


def step(game: JaxHanabiGame, s: HanabiState, uid: jax.Array
         ) -> Tuple[HanabiState, jax.Array]:
    """BatchedHanabi::Step semantics for ONE game: apply `uid` iff
    uid ≥ 0, not terminal, and legal; reward = score delta."""
    mtype_t, slot_t, target_t, color_t, rank_t = [
        jnp.asarray(t) for t in game.move_tables()]
    C, R, P, H = game.colors, game.ranks, game.players, game.hand_size
    uid_c = jnp.clip(uid, 0, game.n_moves - 1)
    # one one-hot contraction for the uid-indexed tables + legality pick
    oh_uid = jnp.arange(game.n_moves) == uid_c
    pick_t = lambda t: jnp.sum(jnp.where(oh_uid, t, 0), dtype=jnp.int32)
    legal = jnp.sum(jnp.where(oh_uid, legal_mask(game, s), 0.0)) > 0
    do = (uid >= 0) & (~s.terminal) & legal
    before = score(game, s)

    mtype = pick_t(mtype_t)
    slot = pick_t(slot_t)
    color = pick_t(color_t)
    rank = pick_t(rank_t)
    tgt = (s.cur_player + pick_t(target_t)) % P
    cur = s.cur_player

    # final_countdown decrement at move ENTRY while deck empty
    deck_empty = s.deck_ptr >= game.deck_len
    countdown = s.final_countdown - (do & deck_empty).astype(jnp.int32)

    card = _sel(_sel(s.hand_card, cur), jnp.clip(slot, 0, H - 1))
    c_col, c_rank = card // R, card % R

    is_discard = do & (mtype == DISCARD)
    is_play = do & (mtype == PLAY)
    is_reveal_c = do & (mtype == REVEAL_COLOR)
    is_reveal_r = do & (mtype == REVEAL_RANK)
    is_cardmove = is_discard | is_play

    # ---- play resolution ------------------------------------------
    oh_col = jnp.arange(C) == jnp.clip(c_col, 0, C - 1)       # [C]
    oh_rank = jnp.arange(R) == jnp.clip(c_rank, 0, R - 1)     # [R]
    fw_at_col = jnp.sum(jnp.where(oh_col, s.fireworks, 0), dtype=jnp.int32)
    success = is_play & (fw_at_col == c_rank)
    top_bonus = success & (c_rank == R - 1) & (s.info < game.max_info)
    misplay = is_play & ~success

    fireworks = s.fireworks + jnp.where(success & oh_col, 1, 0)
    discards = s.discards + jnp.where(
        (is_discard | misplay) & oh_col[:, None] & oh_rank[None, :], 1, 0)
    info = (s.info
            + is_discard.astype(jnp.int32)
            + top_bonus.astype(jnp.int32)
            - (is_reveal_c | is_reveal_r).astype(jnp.int32))
    lives = s.lives - misplay.astype(jnp.int32)

    # ---- hand update for card moves -------------------------------
    removed = _remove_and_draw(game, s, cur, slot)
    pick = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(is_cardmove, x, y), a, b)
    s2 = pick(removed, s)

    # ---- hint knowledge updates -----------------------------------
    slots = jnp.arange(H)
    valid_t = slots < _sel(s.hand_n, tgt)
    t_cards = _sel(s.hand_card, tgt)
    t_col, t_rank = t_cards // R, t_cards % R
    match_c = valid_t & (t_col == color)
    match_r = valid_t & (t_rank == rank)

    kc_row = _sel(s.know_color, tgt)
    kc_new = jnp.where(match_c, 1 << jnp.clip(color, 0, C - 1),
                       kc_row & ~(1 << jnp.clip(color, 0, C - 1)))
    kc_new = jnp.where(valid_t, kc_new, kc_row)
    kr_row = _sel(s.know_rank, tgt)
    kr_new = jnp.where(match_r, 1 << jnp.clip(rank, 0, R - 1),
                       kr_row & ~(1 << jnp.clip(rank, 0, R - 1)))
    kr_new = jnp.where(valid_t, kr_new, kr_row)
    hc_new = jnp.where(match_c, color, _sel(s.hinted_color, tgt))
    hr_new = jnp.where(match_r, rank, _sel(s.hinted_rank, tgt))

    know_color = jnp.where(is_reveal_c,
                           _set_row(s2.know_color, tgt, kc_new),
                           s2.know_color)
    hinted_color = jnp.where(is_reveal_c,
                             _set_row(s2.hinted_color, tgt, hc_new),
                             s2.hinted_color)
    know_rank = jnp.where(is_reveal_r,
                          _set_row(s2.know_rank, tgt, kr_new),
                          s2.know_rank)
    hinted_rank = jnp.where(is_reveal_r,
                            _set_row(s2.hinted_rank, tgt, hr_new),
                            s2.hinted_rank)
    reveal_mask = jnp.where(
        is_reveal_c, jnp.sum(match_c.astype(jnp.int32) << slots),
        jnp.where(is_reveal_r, jnp.sum(match_r.astype(jnp.int32) << slots),
                  0))

    # ---- last-action record (unchanged on no-op) ------------------
    enc_type = mtype  # stored as C++ MoveType code; encoder reorders
    upd = lambda new, old: jnp.where(do, new, old)
    s3 = s2.replace(
        know_color=know_color, know_rank=know_rank,
        hinted_color=hinted_color, hinted_rank=hinted_rank,
        fireworks=jnp.where(do, fireworks, s.fireworks),
        discards=jnp.where(do, discards, s.discards),
        info=upd(info, s.info), lives=upd(lives, s.lives),
        last_acting=upd(cur, s.last_acting),
        last_type=upd(enc_type, s.last_type),
        last_target=upd(jnp.where(is_reveal_c | is_reveal_r, tgt, -1),
                        s.last_target),
        last_color=upd(jnp.where(is_reveal_c, color, -1), s.last_color),
        last_rank=upd(jnp.where(is_reveal_r, rank, -1), s.last_rank),
        last_reveal=upd(reveal_mask, s.last_reveal),
        last_slot=upd(jnp.where(is_cardmove, slot, -1), s.last_slot),
        last_card=upd(jnp.where(is_cardmove, card, -1), s.last_card),
        last_success=upd(success, s.last_success),
        last_added_info=upd(top_bonus, s.last_added_info),
        final_countdown=countdown,
    )

    all_complete = jnp.all(fireworks >= R)
    terminal = jnp.where(
        do, (lives <= 0) | all_complete | (countdown <= 0), s.terminal)
    s3 = s3.replace(
        terminal=terminal,
        cur_player=jnp.where(do, (cur + 1) % P, cur),
    )
    reward = (score(game, s3) - before).astype(jnp.float32) \
        * do.astype(jnp.float32)
    return s3, reward


# ---------------------------------------------------------------------
# Canonical encoding (C++ State::Encode, section-ordered)
# ---------------------------------------------------------------------

def encode(game: JaxHanabiGame, s: HanabiState, player: jax.Array
           ) -> jax.Array:
    C, R, P, H = game.colors, game.ranks, game.players, game.hand_size
    CR = C * R
    slots = jnp.arange(H)
    parts = []

    # --- hands: other players' visible cards, relative order ---
    for off in range(1, P):
        q = (player + off) % P
        cards = _sel(s.hand_card, q)                      # [H]
        valid = (slots < _sel(s.hand_n, q)) & (cards >= 0)
        onehot = jax.nn.one_hot(jnp.clip(cards, 0, CR - 1), CR) \
            * valid[:, None]
        parts.append(onehot.reshape(H * CR))
    missing = jnp.stack([(_sel(s.hand_n, (player + off) % P) < H)
                         for off in range(P)]).astype(jnp.float32)
    parts.append(missing)

    # --- board ---
    deck_bits = game.deck_len - P * H
    deck_size = game.deck_len - s.deck_ptr
    parts.append((jnp.arange(deck_bits) < deck_size).astype(jnp.float32))
    fw = (jnp.arange(R)[None, :] == (s.fireworks[:, None] - 1)
          ).astype(jnp.float32)
    parts.append(fw.reshape(CR))
    parts.append((jnp.arange(game.max_info) < s.info).astype(jnp.float32))
    parts.append((jnp.arange(game.max_life) < s.lives).astype(jnp.float32))

    # --- discards: per (color, rank) thermometer over copy count ---
    for c in range(C):
        for r in range(R):
            w = rank_count(r)
            parts.append((jnp.arange(w) < s.discards[c, r])
                         .astype(jnp.float32))

    # --- last action ---
    rel = lambda a: (a - player + P) % P
    parts.append(jnp.where(
        s.last_acting >= 0,
        jax.nn.one_hot(rel(jnp.maximum(s.last_acting, 0)), P),
        jnp.zeros(P)))
    # one-hot order play, discard, reveal-color, reveal-rank
    type_pos = jnp.select(
        [s.last_type == PLAY, s.last_type == DISCARD,
         s.last_type == REVEAL_COLOR, s.last_type == REVEAL_RANK],
        [0, 1, 2, 3], -1)
    parts.append(jnp.where(type_pos >= 0,
                           jax.nn.one_hot(jnp.maximum(type_pos, 0), 4),
                           jnp.zeros(4)))
    parts.append(jnp.where(
        s.last_target >= 0,
        jax.nn.one_hot(rel(jnp.maximum(s.last_target, 0)), P),
        jnp.zeros(P)))
    parts.append(jnp.where(s.last_color >= 0,
                           jax.nn.one_hot(jnp.maximum(s.last_color, 0), C),
                           jnp.zeros(C)))
    parts.append(jnp.where(s.last_rank >= 0,
                           jax.nn.one_hot(jnp.maximum(s.last_rank, 0), R),
                           jnp.zeros(R)))
    parts.append(((s.last_reveal >> slots) & 1).astype(jnp.float32))
    parts.append(jnp.where(s.last_slot >= 0,
                           jax.nn.one_hot(jnp.maximum(s.last_slot, 0), H),
                           jnp.zeros(H)))
    parts.append(jnp.where(s.last_card >= 0,
                           jax.nn.one_hot(jnp.maximum(s.last_card, 0), CR),
                           jnp.zeros(CR)))
    parts.append(jnp.stack([s.last_success.astype(jnp.float32),
                            s.last_added_info.astype(jnp.float32)]))

    # --- V0 belief (all players, relative order) ---
    if not game.minimal:
        ranks_arr = jnp.arange(R)
        count = (jnp.asarray([rank_count(r) for r in range(R)])[None, :]
                 - s.discards
                 - (s.fireworks[:, None] > ranks_arr[None, :])
                 .astype(jnp.int32))                     # [C, R]
        col_bits = jnp.arange(C)
        rank_bits = jnp.arange(R)
        for off in range(P):
            q = (player + off) % P
            hand_n_q = _sel(s.hand_n, q)
            kc_q = _sel(s.know_color, q)            # [H]
            kr_q = _sel(s.know_rank, q)
            hc_q = _sel(s.hinted_color, q)
            hr_q = _sel(s.hinted_rank, q)
            for slot in range(H):
                in_hand = slot < hand_n_q
                kc = kc_q[slot]
                kr = kr_q[slot]
                pc = ((kc >> col_bits) & 1).astype(jnp.int32)   # [C]
                pr = ((kr >> rank_bits) & 1).astype(jnp.int32)  # [R]
                plaus = pc[:, None] * pr[None, :]                # [C, R]
                total = jnp.sum(plaus * count)
                v0 = (plaus > 0) & (count > 0) & (count == total)
                v0 = v0 & in_hand
                parts.append(v0.astype(jnp.float32).reshape(CR))
                hc = hc_q[slot]
                hr = hr_q[slot]
                parts.append(jnp.where(
                    (hc >= 0) & in_hand,
                    jax.nn.one_hot(jnp.maximum(hc, 0), C), jnp.zeros(C)))
                parts.append(jnp.where(
                    (hr >= 0) & in_hand,
                    jax.nn.one_hot(jnp.maximum(hr, 0), R), jnp.zeros(R)))

    out = jnp.concatenate(parts).astype(jnp.float32)
    return out


def encode_own_hand(game: JaxHanabiGame, s: HanabiState, player: jax.Array
                    ) -> jax.Array:
    C, R, H = game.colors, game.ranks, game.hand_size
    CR = C * R
    cards = _sel(s.hand_card, player)
    valid = (jnp.arange(H) < _sel(s.hand_n, player)) & (cards >= 0)
    onehot = jax.nn.one_hot(jnp.clip(cards, 0, CR - 1), CR) * valid[:, None]
    return onehot.reshape(H * CR).astype(jnp.float32)


def legal_mask_for(game: JaxHanabiGame, s: HanabiState, player: jax.Array
                   ) -> jax.Array:
    """LegalMovesMask(player): zeros unless it's `player`'s turn."""
    mask = legal_mask(game, s)
    return jnp.where((player == s.cur_player) & (~s.terminal), mask,
                     jnp.zeros_like(mask))
