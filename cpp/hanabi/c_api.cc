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
                       uint64_t seed) {
  Config cfg;
  cfg.colors = colors;
  cfg.ranks = ranks;
  cfg.players = players;
  cfg.hand_size = hand_size;
  cfg.max_info_tokens = max_info;
  cfg.max_life_tokens = max_life;
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

}  // extern "C"
