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

int main() {
  TestDims();
  TestInitialState();
  TestHintLegalityAndKnowledge();
  TestGameCompletes();
  TestEncodingInvariants();
  TestBatch();
  std::printf("ALL C++ TESTS PASSED\n");
  return 0;
}
