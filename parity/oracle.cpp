// C++ parity oracle for the backgammon rules engine (SURVEY.md component #28).
//
// A native, host-side reimplementation of the reference Rust engine's
// semantics (/root/reference/src/backgammon/backgammon_logic.rs): board
// transitions (get_next_state :467-517), recursive legal-move tree
// enumeration (:544-720), sequence extraction (:722-750), first-seen
// duplicate-state removal (:753-774), and the 1352-action codec
// (encode :262-359 / decode :361-401) — plus the counter-based seeded dice
// stream shared bit-for-bit with die_e_tpu.envs.backgammon.dice_from_stream.
//
// Exposed through a C ABI consumed via ctypes (parity/oracle.py) by the
// pytest trajectory-parity harness: JAX env == C++ oracle == Python oracle,
// exactly, for every step of seeded games.
//
// Build: g++ -O2 -shared -fPIC -o liboracle.so oracle.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <set>
#include <utility>
#include <vector>

namespace {

struct Board {
  int8_t pts[24];
  int bar[2];  // bar[0] = player -1, bar[1] = player +1
  int off[2];

  bool operator<(const Board& o) const {
    int c = std::memcmp(pts, o.pts, 24);
    if (c != 0) return c < 0;
    if (bar[0] != o.bar[0]) return bar[0] < o.bar[0];
    if (bar[1] != o.bar[1]) return bar[1] < o.bar[1];
    if (off[0] != o.off[0]) return off[0] < o.off[0];
    return off[1] < o.off[1];
  }
  bool operator==(const Board& o) const {
    return std::memcmp(pts, o.pts, 24) == 0 && bar[0] == o.bar[0] &&
           bar[1] == o.bar[1] && off[0] == o.off[0] && off[1] == o.off[1];
  }
};

using Move = std::pair<int, int>;  // (from, to); -1 = bar / borne-off

constexpr int kNumActions = 1352;
constexpr int kNoop = 1351;

const int8_t kInitial[24] = {2, 0, 0,  0, 0, -5, 0, -3, 0, 0, 0, 5,
                             -5, 0, 0, 0, 3, 0,  5, 0,  0, 0, 0, -2};

Board initial_board() {
  Board b;
  std::memcpy(b.pts, kInitial, 24);
  b.bar[0] = b.bar[1] = b.off[0] = b.off[1] = 0;
  return b;
}

// get_next_state (backgammon_logic.rs:467-517)
Board apply(const Board& in, const std::vector<Move>& moves, int player) {
  Board s = in;
  for (auto [from, to] : moves) {
    if (to == -1) {
      s.pts[from] -= player;
      s.off[player == -1 ? 0 : 1] += 1;
      continue;
    }
    if (from == -1) {
      if (s.pts[to] == -player) {
        s.pts[to] = player;
        s.bar[player == -1 ? 1 : 0] += 1;
        s.bar[player == -1 ? 0 : 1] -= 1;
      } else {
        s.pts[to] += player;
        s.bar[player == -1 ? 0 : 1] -= 1;
      }
    } else if (s.pts[to] == -player) {
      s.pts[to] = player;
      s.pts[from] -= player;
      s.bar[player == -1 ? 1 : 0] += 1;
    } else {
      s.pts[to] += player;
      s.pts[from] -= player;
    }
  }
  return s;
}

// is_collectible (backgammon_logic.rs:638-659)
bool collectible(const Board& s, int player) {
  if (player == -1) {
    if (s.bar[0] != 0) return false;
    for (int i = 6; i < 24; ++i)
      if (s.pts[i] < 0) return false;
  } else {
    if (s.bar[1] != 0) return false;
    for (int i = 0; i < 18; ++i)
      if (s.pts[i] > 0) return false;
  }
  return true;
}

using DieMove = std::pair<int, Move>;  // (die used, (from, to))

// get_entry_moves (backgammon_logic.rs:662-703)
std::vector<DieMove> entry_moves(const std::vector<int>& dice, const Board& s,
                                 int player) {
  std::vector<DieMove> acts;
  for (int m : dice) {
    int point = player == -1 ? 24 - m : m - 1;
    bool open = player == -1 ? s.pts[point] < 2 : s.pts[point] > -2;
    if (open) acts.push_back({m, {-1, point}});
  }
  std::sort(acts.begin(), acts.end());
  acts.erase(std::unique(acts.begin(), acts.end()), acts.end());
  return acts;
}

// get_normal_moves incl. bear-off push rules (backgammon_logic.rs:555-636)
std::vector<DieMove> normal_moves(const std::vector<int>& dice, const Board& s,
                                  int player) {
  std::vector<DieMove> acts;
  if (player == -1 && collectible(s, player)) {
    for (int m : dice) {
      int point = m - 1;
      if (s.pts[point] < 0) acts.push_back({m, {point, -1}});
      for (int j = point - 1; j >= 0; --j) {
        int left = 0;
        for (int k = j + 1; k < 6; ++k) left += s.pts[k];
        if (s.pts[j] < 0 && left >= 0) {
          acts.push_back({m, {j, -1}});
          break;
        }
      }
    }
  } else if (player == 1 && collectible(s, player)) {
    for (int m : dice) {
      int point = 24 - m;
      if (s.pts[point] > 0) acts.push_back({m, {point, -1}});
      for (int j = point; j <= 23; ++j) {
        int left = 0;
        for (int k = 18; k < j; ++k) left += s.pts[k];
        if (s.pts[j] > 0 && left <= 0) {
          acts.push_back({m, {j, -1}});
          break;
        }
      }
    }
  }
  for (int m : dice) {
    for (int p = 0; p < 24; ++p) {
      int n = s.pts[p];
      if (player == -1 && n <= -1 && p - m >= 0 && s.pts[p - m] <= 1)
        acts.push_back({m, {p, p - m}});
      else if (player == 1 && n >= 1 && p + m <= 23 && s.pts[p + m] >= -1)
        acts.push_back({m, {p, p + m}});
    }
  }
  std::sort(acts.begin(), acts.end());
  acts.erase(std::unique(acts.begin(), acts.end()), acts.end());
  return acts;
}

// _get_action_trees + extract_sequences (DFS), fused (:544-552, :722-750)
void sequences_rec(const std::vector<int>& dice, const Board& s, int player,
                   std::vector<Move>& prefix,
                   std::vector<std::vector<Move>>& out) {
  int bar = player == -1 ? s.bar[0] : s.bar[1];
  auto acts = bar > 0 ? entry_moves(dice, s, player)
                      : normal_moves(dice, s, player);
  if (acts.empty()) {
    if (!prefix.empty()) out.push_back(prefix);
    return;
  }
  for (auto& [die, mv] : acts) {
    Board ns = apply(s, {mv}, player);
    std::vector<int> nd = dice;
    nd.erase(std::find(nd.begin(), nd.end(), die));
    prefix.push_back(mv);
    if (nd.empty()) {
      out.push_back(prefix);
    } else {
      sequences_rec(nd, ns, player, prefix, out);
    }
    prefix.pop_back();
  }
}

// get_valid_moves (:403-414): sequences + first-seen duplicate-state removal
std::vector<std::vector<Move>> valid_moves(const Board& s, int d0, int d1,
                                           int player) {
  std::vector<int> dice = d0 > d1 ? std::vector<int>{d0, d1}
                                  : std::vector<int>{d1, d0};
  std::vector<std::vector<Move>> seqs;
  std::vector<Move> prefix;
  sequences_rec(dice, s, player, prefix, seqs);
  std::set<Board> seen;
  std::vector<std::vector<Move>> unique;
  for (auto& seq : seqs) {
    Board cur = s;
    for (auto& mv : seq) cur = apply(cur, {mv}, player);
    if (seen.insert(cur).second) unique.push_back(seq);
  }
  return unique;
}

// encode (backgammon_logic.rs:262-359)
int min_roll(const Move& m) {
  auto [f, t] = m;
  if (f == -1) return t < 6 ? t + 1 : 24 - t;
  if (t == -1) return f < 6 ? f + 1 : 24 - f;
  return std::abs(f - t);
}

int encode(const std::vector<Move>& actions, int d0, int d1) {
  if (actions.empty()) return kNoop;
  int low = std::min(d0, d1);
  int mins[2] = {min_roll(actions[0]),
                 actions.size() > 1 ? min_roll(actions[1]) : 0};
  bool low_first = false, low_second = false;
  int enc = 0;
  for (size_t i = 0; i < actions.size(); ++i) {
    auto [f, t] = actions[i];
    int mult = i == 0 ? 1 : 26;
    bool& flag = i == 0 ? low_first : low_second;
    if (f == -1) {
      enc += mult * 24;
      int dist = t < 6 ? t + 1 : 24 - t;
      flag = dist == low;
    } else if (t == -1) {
      enc += mult * f;
    } else {
      enc += mult * f;
      flag = mins[i] == low;
    }
  }
  if (actions.size() == 1) {
    low_first = false;
    enc += 26 * 25;
  }
  bool hrf = low_first  ? false
             : low_second ? true
             : mins[1] != 0 ? mins[0] >= mins[1]
                            : mins[0] > low;
  return hrf ? enc : enc + 676;
}

// decode (backgammon_logic.rs:361-401)
std::vector<Move> decode(int action, int d0, int d1, int player) {
  if (action == kNoop) return {};
  bool hrf = action < 676;
  int base = hrf ? action : action - 676;
  int f1 = base % 26, f2 = base / 26;
  bool single = f2 == 25;
  int high = std::max(d0, d1), low = std::min(d0, d1);
  if (f1 == 24 && player == 1) f1 = -1;
  if (f2 == 24 && player == 1) f2 = -1;
  int t1 = hrf ? f1 + high * player : f1 + low * player;
  int t2 = hrf ? f2 + low * player : f2 + high * player;
  if (t1 >= 24 || t1 <= -1) t1 = -1;
  if (t2 >= 24 || t2 <= -1) t2 = -1;
  if (f1 == 24) f1 = -1;
  if (f2 == 24) f2 = -1;
  if (single) return {{f1, t1}};
  return {{f1, t1}, {f2, t2}};
}

// dice stream — bit-identical to die_e_tpu.envs.backgammon._mix32 /
// dice_from_stream and parity/py_oracle.py
uint32_t mix32(uint32_t x) {
  x ^= x >> 16;
  x *= 0x85EBCA6Bu;
  x ^= x >> 13;
  x *= 0xC2B2AE35u;
  x ^= x >> 16;
  return x;
}

void dice_from_stream(uint32_t seed, uint32_t cnt, uint32_t salt, int* d0,
                      int* d1) {
  uint32_t base =
      mix32(seed ^ mix32(cnt * 0x9E3779B9u) ^ mix32(salt * 0x7F4A7C15u));
  *d0 = static_cast<int>(base % 6u) + 1;
  *d1 = static_cast<int>(mix32(base ^ 0xDEADBEEFu) % 6u) + 1;
}

struct Game {
  Board board;
  int player;
  bool second;
  uint32_t seed;
  int cnt;
  int roll[2];
};

void game_init(Game& g, uint32_t seed) {
  g.board = initial_board();
  g.player = -1;
  g.second = false;
  g.seed = seed;
  g.cnt = 1;
  dice_from_stream(seed, 0, 0, &g.roll[0], &g.roll[1]);
}

void game_step(Game& g, int action) {
  auto moves = decode(action, g.roll[0], g.roll[1], g.player);
  g.board = apply(g.board, moves, g.player);
  bool doubles = g.roll[0] == g.roll[1];
  bool goes_second = doubles && !g.second && action != kNoop;
  if (goes_second) {
    g.second = true;
  } else {
    g.second = false;
    g.player = -g.player;
    dice_from_stream(g.seed, static_cast<uint32_t>(g.cnt),
                     static_cast<uint32_t>(action), &g.roll[0], &g.roll[1]);
    g.cnt += 1;
  }
}

int game_winner(const Game& g) {
  if (g.board.off[0] == 15) return -1;
  if (g.board.off[1] == 15) return 1;
  return 0;
}

Board board_from(const int8_t* pts, const int* bar, const int* off) {
  Board b;
  std::memcpy(b.pts, pts, 24);
  b.bar[0] = bar[0];
  b.bar[1] = bar[1];
  b.off[0] = off[0];
  b.off[1] = off[1];
  return b;
}

}  // namespace

extern "C" {

// Legal action-index mask: {encode(m)} plus explicit no-op when empty.
void bg_legal_mask(const int8_t* pts, const int* bar, const int* off, int d0,
                   int d1, int player, uint8_t* mask_out) {
  Board b = board_from(pts, bar, off);
  std::memset(mask_out, 0, kNumActions);
  auto moves = valid_moves(b, d0, d1, player);
  if (moves.empty()) {
    mask_out[kNoop] = 1;
    return;
  }
  for (auto& m : moves) mask_out[encode(m, d0, d1)] = 1;
}

// One board transition with an encoded action (no turn bookkeeping).
void bg_apply_action(int8_t* pts, int* bar, int* off, int d0, int d1,
                     int player, int action) {
  Board b = board_from(pts, bar, off);
  b = apply(b, decode(action, d0, d1, player), player);
  std::memcpy(pts, b.pts, 24);
  bar[0] = b.bar[0];
  bar[1] = b.bar[1];
  off[0] = b.off[0];
  off[1] = b.off[1];
}

void bg_dice(uint32_t seed, uint32_t cnt, uint32_t salt, int* out2) {
  dice_from_stream(seed, cnt, salt, &out2[0], &out2[1]);
}

// Seeded full-game trajectory.  Actions are chosen as the k-th legal action
// where k comes from the dice stream (salted), making the whole trajectory a
// pure function of `seed` that the JAX env must reproduce exactly.
//
// Per step i (up to max_steps or a win), records into the i-th rows:
//   boards [max_steps x 24], bars/offs [max_steps x 2], rolls [max_steps x 2],
//   players [max_steps], seconds [max_steps], actions [max_steps].
// Returns the number of steps taken.
int bg_run_trajectory(uint32_t seed, int max_steps, int8_t* boards, int* bars,
                      int* offs, int* rolls, int* players, int* seconds,
                      int* actions) {
  Game g;
  game_init(g, seed);
  int t = 0;
  for (; t < max_steps; ++t) {
    std::memcpy(boards + 24 * t, g.board.pts, 24);
    bars[2 * t] = g.board.bar[0];
    bars[2 * t + 1] = g.board.bar[1];
    offs[2 * t] = g.board.off[0];
    offs[2 * t + 1] = g.board.off[1];
    rolls[2 * t] = g.roll[0];
    rolls[2 * t + 1] = g.roll[1];
    players[t] = g.player;
    seconds[t] = g.second ? 1 : 0;
    if (game_winner(g) != 0) {
      actions[t] = -1;
      return t + 1;
    }
    uint8_t mask[kNumActions];
    bg_legal_mask(g.board.pts, g.board.bar, g.board.off, g.roll[0], g.roll[1],
                  g.player, mask);
    int n_legal = 0;
    for (int a = 0; a < kNumActions; ++a) n_legal += mask[a];
    uint32_t pick = mix32(seed ^ mix32(0xACC10000u + static_cast<uint32_t>(t))) %
                    static_cast<uint32_t>(n_legal);
    int action = -1;
    for (int a = 0; a < kNumActions; ++a) {
      if (mask[a]) {
        if (pick == 0) {
          action = a;
          break;
        }
        --pick;
      }
    }
    actions[t] = action;
    game_step(g, action);
  }
  return t;
}

}  // extern "C"
