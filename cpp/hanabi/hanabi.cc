#include "hanabi.h"

#include <algorithm>
#include <cassert>
#include <cstring>
#include <numeric>

namespace hanabi {

int RankCount(int rank) {
  static const int kCounts[5] = {3, 2, 2, 2, 1};
  return kCounts[rank];
}

int CardsPerColor(int ranks) {
  int n = 0;
  for (int r = 0; r < ranks; ++r) n += RankCount(r);
  return n;
}

// ---- Game -----------------------------------------------------------

Game::Game(Config cfg) : cfg_(cfg) {
  if (cfg_.hand_size <= 0) cfg_.hand_size = cfg_.players < 4 ? 5 : 4;
}

int Game::MaxMoves() const {
  const int H = cfg_.hand_size, P = cfg_.players;
  return 2 * H + (P - 1) * (cfg_.colors + cfg_.ranks);
}

int Game::MaxDeckSize() const { return cfg_.colors * CardsPerColor(cfg_.ranks); }

Move Game::GetMove(int uid) const {
  const int H = cfg_.hand_size, P = cfg_.players;
  Move m;
  if (uid < 0) return m;
  if (uid < H) {
    m.type = MoveType::kDiscard;
    m.slot = uid;
  } else if (uid < 2 * H) {
    m.type = MoveType::kPlay;
    m.slot = uid - H;
  } else if (uid < 2 * H + (P - 1) * cfg_.colors) {
    int k = uid - 2 * H;
    m.type = MoveType::kRevealColor;
    m.target_offset = 1 + k / cfg_.colors;
    m.color = k % cfg_.colors;
  } else if (uid < MaxMoves()) {
    int k = uid - 2 * H - (P - 1) * cfg_.colors;
    m.type = MoveType::kRevealRank;
    m.target_offset = 1 + k / cfg_.ranks;
    m.rank = k % cfg_.ranks;
  }
  return m;
}

int Game::ObsDim() const {
  const int C = cfg_.colors, R = cfg_.ranks, P = cfg_.players,
            H = cfg_.hand_size;
  const int hands = (P - 1) * H * C * R + P;
  const int board = (MaxDeckSize() - P * H) + C * R + cfg_.max_info_tokens +
                    cfg_.max_life_tokens;
  const int discards = C * CardsPerColor(R);
  const int last = P + 4 + P + C + R + H + H + C * R + 2;
  const int knowledge = cfg_.minimal ? 0 : P * H * (C * R + C + R);
  return hands + board + discards + last + knowledge;
}

int Game::OwnHandDim() const {
  return cfg_.hand_size * cfg_.colors * cfg_.ranks;
}

// ---- State ----------------------------------------------------------

State::State(const Game* game, uint64_t seed)
    : game_(game), cfg_(game->config()) {
  if (cfg_.hand_size <= 0) cfg_.hand_size = cfg_.players < 4 ? 5 : 4;
  Reset(seed);
}

Knowledge State::FreshKnowledge() const {
  Knowledge k;
  k.color_plausible = (1u << cfg_.colors) - 1;
  k.rank_plausible = (1u << cfg_.ranks) - 1;
  return k;
}

void State::Reset(uint64_t seed) {
  rng_.seed(seed);
  deck_.clear();
  for (int c = 0; c < cfg_.colors; ++c)
    for (int r = 0; r < cfg_.ranks; ++r)
      for (int k = 0; k < RankCount(r); ++k)
        deck_.push_back(Card{static_cast<int8_t>(c), static_cast<int8_t>(r)});
  std::shuffle(deck_.begin(), deck_.end(), rng_);

  hands_.assign(cfg_.players, {});
  knowledge_.assign(cfg_.players, {});
  fireworks_.fill(0);
  discard_counts_.assign(cfg_.colors * cfg_.ranks, 0);
  info_tokens_ = cfg_.max_info_tokens;
  life_tokens_ = cfg_.max_life_tokens;
  cur_player_ = 0;
  // Matches HLE turns_to_play_ (hanabi_state.cc:102,221-224): initialized
  // to the player count and decremented at the ENTRY of every move applied
  // while the deck is empty — so the player who drew the last card still
  // gets one final turn.
  final_countdown_ = cfg_.players;
  terminal_ = false;
  last_ = LastAction{};
  DealInitialHands();
}

void State::ResetWithDeck(const Card* cards, int n) {
  // Deterministic-replay entry (golden tests vs the reference HLE):
  // `cards` is the DRAW order; deck_ pops from the back.
  Reset(0);
  hands_.assign(cfg_.players, {});
  knowledge_.assign(cfg_.players, {});
  deck_.assign(cards, cards + n);
  std::reverse(deck_.begin(), deck_.end());
  final_countdown_ = cfg_.players;
  DealInitialHands();
}

void State::DealInitialHands() {
  for (int p = 0; p < cfg_.players; ++p)
    for (int s = 0; s < cfg_.hand_size; ++s) Draw(p);
}

void State::Draw(int player) {
  if (deck_.empty()) return;
  hands_[player].push_back(deck_.back());
  deck_.pop_back();
  knowledge_[player].push_back(FreshKnowledge());
}

bool State::Legal(int uid) const {
  if (terminal_ || uid < 0 || uid >= game_->MaxMoves()) return false;
  const Move m = game_->GetMove(uid);
  const auto& hand = hands_[cur_player_];
  switch (m.type) {
    case MoveType::kDiscard:
      return m.slot < static_cast<int>(hand.size()) &&
             info_tokens_ < cfg_.max_info_tokens;
    case MoveType::kPlay:
      return m.slot < static_cast<int>(hand.size());
    case MoveType::kRevealColor: {
      if (info_tokens_ <= 0) return false;
      int t = (cur_player_ + m.target_offset) % cfg_.players;
      for (const Card& c : hands_[t])
        if (c.color == m.color) return true;
      return false;
    }
    case MoveType::kRevealRank: {
      if (info_tokens_ <= 0) return false;
      int t = (cur_player_ + m.target_offset) % cfg_.players;
      for (const Card& c : hands_[t])
        if (c.rank == m.rank) return true;
      return false;
    }
    default:
      return false;
  }
}

void State::Apply(int uid) {
  assert(Legal(uid));
  // HLE decrements turns_to_play_ when the deck is empty at move ENTRY
  // (hanabi_state.cc:221-224) — the move that draws the last card does
  // not count toward the final round.
  if (deck_.empty()) --final_countdown_;
  const Move m = game_->GetMove(uid);
  auto& hand = hands_[cur_player_];
  auto& know = knowledge_[cur_player_];
  last_ = LastAction{};
  last_.acting_player = cur_player_;
  last_.type = m.type;

  switch (m.type) {
    case MoveType::kDiscard: {
      Card c = hand[m.slot];
      hand.erase(hand.begin() + m.slot);
      know.erase(know.begin() + m.slot);
      ++discard_counts_[c.color * cfg_.ranks + c.rank];
      ++info_tokens_;
      last_.slot = m.slot;
      last_.card = c;
      Draw(cur_player_);
      break;
    }
    case MoveType::kPlay: {
      Card c = hand[m.slot];
      hand.erase(hand.begin() + m.slot);
      know.erase(know.begin() + m.slot);
      last_.slot = m.slot;
      last_.card = c;
      if (fireworks_[c.color] == c.rank) {
        ++fireworks_[c.color];
        last_.success = true;
        if (c.rank == cfg_.ranks - 1 && info_tokens_ < cfg_.max_info_tokens) {
          ++info_tokens_;
          last_.added_info = true;
        }
      } else {
        --life_tokens_;
        ++discard_counts_[c.color * cfg_.ranks + c.rank];
      }
      Draw(cur_player_);
      break;
    }
    case MoveType::kRevealColor: {
      int t = (cur_player_ + m.target_offset) % cfg_.players;
      --info_tokens_;
      last_.target_player = t;
      last_.color = m.color;
      for (size_t s = 0; s < hands_[t].size(); ++s) {
        Knowledge& k = knowledge_[t][s];
        if (hands_[t][s].color == m.color) {
          k.hinted_color = m.color;
          k.color_plausible = 1u << m.color;
          last_.reveal_bitmask |= 1u << s;
        } else {
          k.color_plausible &= ~(1u << m.color);
        }
      }
      break;
    }
    case MoveType::kRevealRank: {
      int t = (cur_player_ + m.target_offset) % cfg_.players;
      --info_tokens_;
      last_.target_player = t;
      last_.rank = m.rank;
      for (size_t s = 0; s < hands_[t].size(); ++s) {
        Knowledge& k = knowledge_[t][s];
        if (hands_[t][s].rank == m.rank) {
          k.hinted_rank = m.rank;
          k.rank_plausible = 1u << m.rank;
          last_.reveal_bitmask |= 1u << s;
        } else {
          k.rank_plausible &= ~(1u << m.rank);
        }
      }
      break;
    }
    default:
      break;
  }

  bool all_complete = true;
  for (int c = 0; c < cfg_.colors; ++c)
    if (fireworks_[c] < cfg_.ranks) all_complete = false;
  if (life_tokens_ <= 0 || all_complete || final_countdown_ <= 0)
    terminal_ = true;

  cur_player_ = (cur_player_ + 1) % cfg_.players;
}

int State::Score() const {
  if (life_tokens_ <= 0) return 0;
  return std::accumulate(fireworks_.begin(),
                         fireworks_.begin() + cfg_.colors, 0);
}

// ---- encoding -------------------------------------------------------

namespace {
inline int RelPlayer(int abs_player, int viewer, int players) {
  return (abs_player - viewer + players) % players;
}
}  // namespace

void State::Encode(int player, float* out) const {
  const int C = cfg_.colors, R = cfg_.ranks, P = cfg_.players,
            H = cfg_.hand_size;
  std::memset(out, 0, sizeof(float) * game_->ObsDim());
  float* p = out;

  // --- hands: other players' visible cards (relative order) ---
  for (int off = 1; off < P; ++off) {
    int q = (player + off) % P;
    for (int s = 0; s < H; ++s) {
      if (s < static_cast<int>(hands_[q].size())) {
        const Card& c = hands_[q][s];
        p[s * C * R + c.color * R + c.rank] = 1.0f;
      }
    }
    p += H * C * R;
  }
  for (int off = 0; off < P; ++off) {
    int q = (player + off) % P;
    if (static_cast<int>(hands_[q].size()) < H) p[off] = 1.0f;
  }
  p += P;

  // --- board ---
  int deck_bits = game_->MaxDeckSize() - P * H;
  for (int i = 0; i < static_cast<int>(deck_.size()) && i < deck_bits; ++i)
    p[i] = 1.0f;
  p += deck_bits;
  for (int c = 0; c < C; ++c) {
    if (fireworks_[c] > 0) p[c * R + fireworks_[c] - 1] = 1.0f;
  }
  p += C * R;
  for (int i = 0; i < info_tokens_; ++i) p[i] = 1.0f;
  p += cfg_.max_info_tokens;
  for (int i = 0; i < life_tokens_; ++i) p[i] = 1.0f;
  p += cfg_.max_life_tokens;

  // --- discards: per (color, rank) thermometer of copies ---
  for (int c = 0; c < C; ++c) {
    for (int r = 0; r < R; ++r) {
      int n = discard_counts_[c * R + r];
      for (int i = 0; i < n; ++i) p[i] = 1.0f;
      p += RankCount(r);
    }
  }

  // --- last action ---
  if (last_.acting_player >= 0) {
    p[RelPlayer(last_.acting_player, player, P)] = 1.0f;
  }
  p += P;
  // One-hot move-type order is play, discard, reveal-color, reveal-rank
  // (canonical_encoders.cc EncodeLastAction switch), NOT our enum order.
  switch (last_.type) {
    case MoveType::kPlay:        p[0] = 1.0f; break;
    case MoveType::kDiscard:     p[1] = 1.0f; break;
    case MoveType::kRevealColor: p[2] = 1.0f; break;
    case MoveType::kRevealRank:  p[3] = 1.0f; break;
    default: break;
  }
  p += 4;
  if (last_.target_player >= 0)
    p[RelPlayer(last_.target_player, player, P)] = 1.0f;
  p += P;
  if (last_.color >= 0) p[last_.color] = 1.0f;
  p += C;
  if (last_.rank >= 0) p[last_.rank] = 1.0f;
  p += R;
  for (int s = 0; s < H; ++s)
    if (last_.reveal_bitmask & (1u << s)) p[s] = 1.0f;
  p += H;
  if (last_.slot >= 0) p[last_.slot] = 1.0f;
  p += H;
  if (last_.card.valid())
    p[last_.card.color * R + last_.card.rank] = 1.0f;
  p += C * R;
  if (last_.success) p[0] = 1.0f;
  if (last_.added_info) p[1] = 1.0f;
  p += 2;

  // --- V0 belief (all players, relative order) ---
  // The reference fork replaces the raw plausibility bits with a "V0
  // belief" (canonical_encoders.cc EncodeV0Belief_): each plausibility
  // bit is multiplied by the remaining copy count of that card type
  // (full composition − discards − played fireworks) and divided by the
  // per-card total IN INTEGER ARITHMETIC — so the bit survives only
  // when that type carries ALL the remaining probability mass (the card
  // is fully determined). The hinted color/rank one-hots are unchanged.
  // Dropped entirely under kMinimal.
  if (cfg_.minimal) return;
  std::vector<int> count(C * R);
  for (int c = 0; c < C; ++c)
    for (int r = 0; r < R; ++r)
      count[c * R + r] = RankCount(r) - discard_counts_[c * R + r] -
                         (fireworks_[c] > r ? 1 : 0);
  for (int off = 0; off < P; ++off) {
    int q = (player + off) % P;
    for (int s = 0; s < H; ++s) {
      if (s < static_cast<int>(knowledge_[q].size())) {
        const Knowledge& k = knowledge_[q][s];
        long total = 0;
        for (int c = 0; c < C; ++c)
          for (int r = 0; r < R; ++r)
            if ((k.color_plausible & (1u << c)) &&
                (k.rank_plausible & (1u << r)))
              total += count[c * R + r];
        for (int c = 0; c < C; ++c)
          for (int r = 0; r < R; ++r)
            if ((k.color_plausible & (1u << c)) &&
                (k.rank_plausible & (1u << r)) &&
                count[c * R + r] > 0 && count[c * R + r] == total)
              p[c * R + r] = 1.0f;
        if (k.hinted_color >= 0) p[C * R + k.hinted_color] = 1.0f;
        if (k.hinted_rank >= 0) p[C * R + C + k.hinted_rank] = 1.0f;
      }
      p += C * R + C + R;
    }
  }
}

void State::EncodeOwnHand(int player, float* out) const {
  const int C = cfg_.colors, R = cfg_.ranks, H = cfg_.hand_size;
  std::memset(out, 0, sizeof(float) * game_->OwnHandDim());
  const auto& hand = hands_[player];
  for (int s = 0; s < static_cast<int>(hand.size()) && s < H; ++s)
    out[s * C * R + hand[s].color * R + hand[s].rank] = 1.0f;
}

void State::LegalMovesMask(int player, float* out) const {
  const int n = game_->MaxMoves();
  std::memset(out, 0, sizeof(float) * n);
  if (player != cur_player_ || terminal_) return;
  for (int uid = 0; uid < n; ++uid)
    if (Legal(uid)) out[uid] = 1.0f;
}

// ---- BatchedHanabi --------------------------------------------------

BatchedHanabi::BatchedHanabi(int n_games, Config cfg, uint64_t seed)
    : game_(cfg), seed_rng_(seed) {
  states_.reserve(n_games);
  for (int i = 0; i < n_games; ++i) states_.emplace_back(&game_, seed_rng_());
}

void BatchedHanabi::Reset(const uint8_t* mask) {
  for (size_t i = 0; i < states_.size(); ++i)
    if (mask == nullptr || mask[i]) states_[i].Reset(seed_rng_());
}

void BatchedHanabi::Step(const int32_t* actions, float* reward_out) {
  for (size_t i = 0; i < states_.size(); ++i) {
    float r = 0.0f;
    if (actions[i] >= 0 && !states_[i].Terminal() &&
        states_[i].Legal(actions[i])) {
      int before = states_[i].Score();
      states_[i].Apply(actions[i]);
      r = static_cast<float>(states_[i].Score() - before);
    }
    if (reward_out) reward_out[i] = r;
  }
}

void BatchedHanabi::ObservePlayer(int player, float* obs) const {
  const int od = game_.ObsDim();
  for (size_t i = 0; i < states_.size(); ++i)
    states_[i].Encode(player, obs + i * od);
}

void BatchedHanabi::Observe(float* obs, float* ownhand, float* avail,
                            int32_t* cur_player, uint8_t* done,
                            int32_t* score) const {
  const int od = game_.ObsDim(), hd = game_.OwnHandDim(),
            md = game_.MaxMoves();
  for (size_t i = 0; i < states_.size(); ++i) {
    const State& s = states_[i];
    int cp = s.CurPlayer();
    if (obs) s.Encode(cp, obs + i * od);
    if (ownhand) s.EncodeOwnHand(cp, ownhand + i * hd);
    if (avail) s.LegalMovesMask(cp, avail + i * md);
    if (cur_player) cur_player[i] = cp;
    if (done) done[i] = s.Terminal() ? 1 : 0;
    if (score) score[i] = s.Score();
  }
}

}  // namespace hanabi
