// C ABI over the Hanabi engine (ctypes binding surface).
// Equivalent role to the reference's pyhanabi.{h,cc} extern "C" layer
// (/root/reference/onpolicy/envs/hanabi/pyhanabi.cc), but batched: one
// FFI crossing steps/encodes the whole fleet.
#include <cstdint>

#include "hanabi.h"

using hanabi::BatchedHanabi;
using hanabi::Config;

extern "C" {

void* hanabi_batch_new(int n_games, int colors, int ranks, int players,
                       int hand_size, int max_info, int max_life,
                       int minimal, uint64_t seed) {
  Config cfg;
  cfg.colors = colors;
  cfg.ranks = ranks;
  cfg.players = players;
  cfg.hand_size = hand_size;
  cfg.max_info_tokens = max_info;
  cfg.max_life_tokens = max_life;
  cfg.minimal = minimal != 0;
  return new BatchedHanabi(n_games, cfg, seed);
}

void hanabi_batch_free(void* h) { delete static_cast<BatchedHanabi*>(h); }

int hanabi_max_moves(void* h) {
  return static_cast<BatchedHanabi*>(h)->game().MaxMoves();
}

int hanabi_obs_dim(void* h) {
  return static_cast<BatchedHanabi*>(h)->game().ObsDim();
}

int hanabi_ownhand_dim(void* h) {
  return static_cast<BatchedHanabi*>(h)->game().OwnHandDim();
}

void hanabi_batch_reset(void* h, const uint8_t* mask) {
  static_cast<BatchedHanabi*>(h)->Reset(mask);
}

void hanabi_batch_step(void* h, const int32_t* actions, float* rewards) {
  static_cast<BatchedHanabi*>(h)->Step(actions, rewards);
}

void hanabi_batch_observe(void* h, float* obs, float* ownhand, float* avail,
                          int32_t* cur_player, uint8_t* done,
                          int32_t* score) {
  static_cast<BatchedHanabi*>(h)->Observe(obs, ownhand, avail, cur_player,
                                          done, score);
}

void hanabi_batch_observe_player(void* h, int player, float* obs) {
  static_cast<BatchedHanabi*>(h)->ObservePlayer(player, obs);
}

// ---- single-state replay surface ------------------------------------
// Drives one State with an injected deck, for bit-level golden tests of
// the canonical/own-hand encoders against the reference HLE
// (canonical_encoders.cc, pyhanabi.cc:839-890). The pair {game, state}
// is owned together.

struct SingleState {
  hanabi::Game game;
  hanabi::State state;
  SingleState(Config cfg) : game(cfg), state(&game, 0) {}
};

void* hanabi_state_new(int colors, int ranks, int players, int hand_size,
                       int max_info, int max_life, int minimal,
                       const int8_t* deck_colors, const int8_t* deck_ranks,
                       int n_cards) {
  Config cfg;
  cfg.colors = colors;
  cfg.ranks = ranks;
  cfg.players = players;
  cfg.hand_size = hand_size;
  cfg.max_info_tokens = max_info;
  cfg.max_life_tokens = max_life;
  cfg.minimal = minimal != 0;
  auto* s = new SingleState(cfg);
  std::vector<hanabi::Card> deck(n_cards);
  for (int i = 0; i < n_cards; ++i)
    deck[i] = hanabi::Card{deck_colors[i], deck_ranks[i]};
  s->state.ResetWithDeck(deck.data(), n_cards);
  return s;
}

void hanabi_state_free(void* s) { delete static_cast<SingleState*>(s); }

int hanabi_state_cur_player(void* s) {
  return static_cast<SingleState*>(s)->state.CurPlayer();
}
int hanabi_state_terminal(void* s) {
  return static_cast<SingleState*>(s)->state.Terminal() ? 1 : 0;
}
int hanabi_state_score(void* s) {
  return static_cast<SingleState*>(s)->state.Score();
}
int hanabi_state_deck_size(void* s) {
  return static_cast<SingleState*>(s)->state.DeckSize();
}
int hanabi_state_info_tokens(void* s) {
  return static_cast<SingleState*>(s)->state.InfoTokens();
}
int hanabi_state_life_tokens(void* s) {
  return static_cast<SingleState*>(s)->state.LifeTokens();
}
int hanabi_state_legal(void* s, int uid) {
  return static_cast<SingleState*>(s)->state.Legal(uid) ? 1 : 0;
}
void hanabi_state_apply(void* s, int uid) {
  static_cast<SingleState*>(s)->state.Apply(uid);
}
void hanabi_state_encode(void* s, int player, float* out) {
  static_cast<SingleState*>(s)->state.Encode(player, out);
}
void hanabi_state_encode_ownhand(void* s, int player, float* out) {
  static_cast<SingleState*>(s)->state.EncodeOwnHand(player, out);
}
void hanabi_state_legal_mask(void* s, int player, float* out) {
  static_cast<SingleState*>(s)->state.LegalMovesMask(player, out);
}

}  // extern "C"
