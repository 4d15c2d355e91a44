// Hanabi game engine — from-scratch C++ implementation of the card game
// with the capabilities of the reference's vendored DeepMind HLE fork
// (/root/reference/onpolicy/envs/hanabi/hanabi_lib/ — game/state/hand/
// move/observation/canonical_encoders, ~2900 LoC): configurable
// colors/ranks/players/tokens, move uid enumeration, legality, scoring,
// the canonical bit-vector observation encoding, and the reference
// repo's own-hand encoder extension for centralized critics
// (canonical_encoders.cc:549-596).
//
// TPU-native addition: a BATCHED engine (BatchedHanabi) stepping N games
// with an actions array (-1 = no-op) and masked reset, so the host
// ingestion path crosses the FFI once per step for the whole fleet
// instead of once per game.
#pragma once

#include <array>
#include <cstdint>
#include <random>
#include <vector>

namespace hanabi {

struct Config {
  int colors = 5;
  int ranks = 5;
  int players = 2;
  int hand_size = 5;  // derived: 5 for <4 players else 4
  int max_info_tokens = 8;
  int max_life_tokens = 3;
  // HLE observation_type kMinimal: the card-knowledge/V0-belief section
  // is dropped entirely (canonical_encoders.cc:Shape, reference
  // Hanabi-Full-Minimal preset).
  bool minimal = false;
};

struct Card {
  int8_t color = -1;
  int8_t rank = -1;  // 0-based
  bool valid() const { return color >= 0; }
};

// Per-card hint knowledge: plausibility bitsets + direct hints.
struct Knowledge {
  uint32_t color_plausible = 0;
  uint32_t rank_plausible = 0;
  int8_t hinted_color = -1;
  int8_t hinted_rank = -1;
};

// Move uid layout (matching HLE enumeration):
//   [0, H)              discard slot
//   [H, 2H)             play slot
//   [2H, 2H+(P-1)*C)    reveal color (target offset-1, color)
//   [.., +(P-1)*R)      reveal rank  (target offset-1, rank)
enum class MoveType { kDiscard, kPlay, kRevealColor, kRevealRank, kInvalid };

struct Move {
  MoveType type = MoveType::kInvalid;
  int slot = -1;          // discard/play
  int target_offset = 0;  // reveal (1..P-1)
  int color = -1;
  int rank = -1;
};

// Number of copies of each rank in a single color's sub-deck.
int RankCount(int rank);
int CardsPerColor(int ranks);

class Game {
 public:
  explicit Game(Config cfg);
  const Config& config() const { return cfg_; }
  int MaxMoves() const;
  int MaxDeckSize() const;
  Move GetMove(int uid) const;
  int ObsDim() const;       // canonical observation length
  int OwnHandDim() const;   // own-hand encoding length

 private:
  Config cfg_;
};

struct LastAction {
  int acting_player = -1;  // absolute id; -1 = none yet (or deal)
  MoveType type = MoveType::kInvalid;
  int target_player = -1;  // absolute id
  int color = -1;
  int rank = -1;
  uint32_t reveal_bitmask = 0;  // slots touched by the hint
  int slot = -1;
  Card card;               // card played/discarded
  bool success = false;    // play scored
  bool added_info = false; // play of top rank restored a token
};

class State {
 public:
  State(const Game* game, uint64_t seed);

  void Reset(uint64_t seed);
  // Deterministic replay: start a fresh game whose draws consume `cards`
  // in order (golden-parity tests drive this with the deal sequence
  // recorded from the reference HLE).
  void ResetWithDeck(const Card* cards, int n);
  bool Legal(int uid) const;
  void Apply(int uid);                  // asserts legality
  bool Terminal() const { return terminal_; }
  int Score() const;                    // 0 if lives exhausted
  int CurPlayer() const { return cur_player_; }
  int DeckSize() const { return static_cast<int>(deck_.size()); }
  int InfoTokens() const { return info_tokens_; }
  int LifeTokens() const { return life_tokens_; }
  int Fireworks(int color) const { return fireworks_[color]; }
  const std::vector<Card>& Hand(int player) const { return hands_[player]; }
  const std::vector<Knowledge>& Know(int player) const {
    return knowledge_[player];
  }

  // Canonical observation from `player`'s perspective → out[ObsDim()].
  void Encode(int player, float* out) const;
  // Own (hidden) hand encoding → out[OwnHandDim()].
  void EncodeOwnHand(int player, float* out) const;
  void LegalMovesMask(int player, float* out) const;  // out[MaxMoves()]

 private:
  void Draw(int player);
  void DealInitialHands();
  Knowledge FreshKnowledge() const;

  const Game* game_;
  Config cfg_;
  std::mt19937_64 rng_;
  std::vector<Card> deck_;                    // draw from back
  std::vector<std::vector<Card>> hands_;
  std::vector<std::vector<Knowledge>> knowledge_;
  std::array<int, 5> fireworks_{};
  std::vector<int> discard_counts_;           // [colors * ranks]
  int info_tokens_ = 0;
  int life_tokens_ = 0;
  int cur_player_ = 0;
  int final_countdown_ = -1;  // moves left once deck is empty
  bool terminal_ = false;
  LastAction last_;
};

// ---- batched fleet --------------------------------------------------
class BatchedHanabi {
 public:
  BatchedHanabi(int n_games, Config cfg, uint64_t seed);
  int n_games() const { return static_cast<int>(states_.size()); }
  const Game& game() const { return game_; }

  void Reset(const uint8_t* mask);            // mask=null → reset all
  // actions[i] = move uid or -1 for no-op. Returns per-game score delta.
  void Step(const int32_t* actions, float* reward_out);
  // Gather current-player observations for every game.
  void Observe(float* obs, float* ownhand, float* avail,
               int32_t* cur_player, uint8_t* done, int32_t* score) const;
  // Encode a FIXED seat's view for every game (obs_instead_of_state).
  void ObservePlayer(int player, float* obs) const;

 private:
  Game game_;
  std::vector<State> states_;
  std::mt19937_64 seed_rng_;
};

}  // namespace hanabi
