"""Reference-faithful Python oracle for the backgammon rules engine.

This is a semantic transliteration of the reference Rust engine
(/root/reference/src/backgammon/backgammon_logic.rs) used by the test suite to
validate the vectorized JAX mask kernel on arbitrary positions.  It follows
the reference *exactly*, including its quirks (e.g. the bear-off "left sum"
conditions, :562-597, and duplicate-state removal order, :753-774).  The C++
oracle (parity/oracle.cpp) implements the same semantics for the seeded
trajectory-parity harness.

Board representation: (points: list[24] int, bar: (int, int), off: (int, int))
with negative counts for player -1.  Moves are (from, to) pairs with -1
meaning "bar" on the from side and "borne off" on the to side.
"""

from __future__ import annotations

from typing import List, Tuple

Move = Tuple[int, int]
Board = Tuple[List[int], Tuple[int, int], Tuple[int, int]]

NUM_ACTIONS = 1352
NOOP_ACTION = 1351

INITIAL_POINTS = [
    2, 0, 0, 0, 0, -5, 0, -3, 0, 0, 0, 5,
    -5, 0, 0, 0, 3, 0, 5, 0, 0, 0, 0, -2,
]


def initial_board() -> Board:
    return (list(INITIAL_POINTS), (0, 0), (0, 0))


def get_next_state(state: Board, actions: List[Move], player: int) -> Board:
    """Mirror of get_next_state (backgammon_logic.rs:467-517)."""
    points = list(state[0])
    bar = list(state[1])
    off = list(state[2])
    for (frm, to) in actions:
        if to == -1:
            points[frm] -= player
            if player == -1:
                off[0] += 1
            else:
                off[1] += 1
            continue
        if frm == -1:
            if points[to] == -player:
                points[to] = player
                if player == -1:
                    bar[1] += 1
                    bar[0] -= 1
                else:
                    bar[0] += 1
                    bar[1] -= 1
            elif player == -1:
                points[to] -= 1
                bar[0] -= 1
            else:
                points[to] += 1
                bar[1] -= 1
        elif points[to] == -player:
            points[to] = player
            points[frm] -= player
            if player == -1:
                bar[1] += 1
            else:
                bar[0] += 1
        else:
            points[to] += player
            points[frm] -= player
    return (points, (bar[0], bar[1]), (off[0], off[1]))


def check_winner(state: Board) -> int:
    if state[2][0] == 15:
        return -1
    if state[2][1] == 15:
        return 1
    return 0


def is_collectible(state: Board, player: int) -> bool:
    """Mirror of is_collectible (backgammon_logic.rs:638-659)."""
    points, bar, _ = state
    if player == -1:
        if bar[0] != 0:
            return False
        return all(points[i] >= 0 for i in range(6, 24))
    else:
        if bar[1] != 0:
            return False
        return all(points[i] <= 0 for i in range(0, 18))


def _entry_moves(moves: List[int], state: Board, player: int):
    """Mirror of get_entry_moves (backgammon_logic.rs:662-703); returns the
    sorted, deduped (die, (from, to)) list."""
    points = state[0]
    acts = []
    for m in moves:
        if player == -1:
            point = 24 - m
            if points[point] < 2:
                acts.append((m, (-1, point)))
        else:
            point = m - 1
            if points[point] > -2:
                acts.append((m, (-1, point)))
    acts = sorted(set(acts))
    return acts


def _normal_moves(moves: List[int], state: Board, player: int):
    """Mirror of get_normal_moves (backgammon_logic.rs:555-636) incl. the
    bear-off push rules and their quirky 'left sum' conditions."""
    points = state[0]
    acts = []
    if player == -1 and is_collectible(state, player):
        for m in moves:
            point = m - 1
            if points[point] < 0:
                acts.append((m, (point, -1)))
            for j in range(point - 1, -1, -1):
                left_sum = sum(points[j + 1 : 6])
                if points[j] < 0 and left_sum >= 0:
                    acts.append((m, (j, -1)))
                    break
    elif player == 1 and is_collectible(state, player):
        for m in moves:
            point = 24 - m
            if points[point] > 0:
                acts.append((m, (point, -1)))
            for j in range(point, 24):
                left_sum = sum(points[18:j])
                if points[j] > 0 and left_sum <= 0:
                    acts.append((m, (j, -1)))
                    break
    for m in moves:
        for point in range(24):
            n = points[point]
            if player == -1 and n <= -1 and point - m >= 0 and points[point - m] <= 1:
                acts.append((m, (point, point - m)))
            elif player == 1 and n >= 1 and point + m <= 23 and points[point + m] >= -1:
                acts.append((m, (point, point + m)))
    acts = sorted(set(acts))
    return acts


def _action_trees(moves: List[int], state: Board, player: int):
    """Mirror of _get_action_trees (:544-552): (move, children) node list."""
    bar = state[1][0] if player == -1 else state[1][1]
    acts = (
        _entry_moves(moves, state, player)
        if bar > 0
        else _normal_moves(moves, state, player)
    )
    trees = []
    for (m, mv) in acts:
        nstate = get_next_state(state, [mv], player)
        nmoves = list(moves)
        nmoves.remove(m)
        children = _action_trees(nmoves, nstate, player) if nmoves else []
        trees.append((mv, children))
    return trees


def _extract(trees) -> List[List[Move]]:
    """Mirror of extract_sequences_list (:722-750): DFS leaf sequences."""
    out: List[List[Move]] = []

    def rec(node, prefix):
        mv, children = node
        seq = prefix + [mv]
        if not children:
            out.append(seq)
        else:
            for ch in children:
                rec(ch, seq)

    for t in trees:
        rec(t, [])
    return out


def _freeze(state: Board):
    return (tuple(state[0]), state[1], state[2])


def get_valid_moves(state: Board, roll: Tuple[int, int], player: int):
    """Mirror of get_valid_moves (:403-414): tree sequences, first-seen
    duplicate-state removal."""
    r0, r1 = roll
    all_moves = [r0, r1] if r0 > r1 else [r1, r0]
    trees = _action_trees(all_moves, state, player)
    seqs = _extract(trees)
    seen = set()
    unique = []
    for seq in seqs:
        cur = state
        for mv in seq:
            cur = get_next_state(cur, [mv], player)
        key = _freeze(cur)
        if key not in seen:
            seen.add(key)
            unique.append(seq)
    return unique


def encode(actions: List[Move], roll: Tuple[int, int]) -> int:
    """Mirror of encode (backgammon_logic.rs:262-359)."""
    assert len(actions) <= 2
    if not actions:
        return NOOP_ACTION
    low = min(roll)

    def min_roll(frm, to):
        if frm == -1:
            return to + 1 if to < 6 else 24 - to
        if to == -1:
            return frm + 1 if frm < 6 else 24 - frm
        return abs(frm - to)

    mins = [min_roll(f, t) for (f, t) in actions]
    if len(mins) == 1:
        mins.append(0)

    low_first = False
    low_second = False
    enc = 0
    for i, (frm, to) in enumerate(actions):
        mult = 1 if i == 0 else 26
        if frm == -1:
            enc += mult * 24
            dist = to + 1 if to < 6 else 24 - to
            if i == 0:
                low_first = dist == low
            else:
                low_second = dist == low
        elif to == -1:
            enc += mult * frm
        else:
            enc += mult * frm
            if i == 0:
                low_first = mins[0] == low
            else:
                low_second = mins[1] == low
    if len(actions) == 1:
        low_first = False
        enc += 26 * 25
    if low_first:
        hrf = False
    elif low_second:
        hrf = True
    elif mins[1] != 0:
        hrf = mins[0] >= mins[1]
    else:
        hrf = mins[0] > low
    return enc if hrf else enc + 676


def decode(action: int, roll: Tuple[int, int], player: int) -> List[Move]:
    """Mirror of decode (backgammon_logic.rs:361-401)."""
    if action == NOOP_ACTION:
        return []
    hrf = action < 676
    base = action if hrf else action - 676
    f1, f2 = base % 26, base // 26
    single = f2 == 25
    high, low = max(roll), min(roll)
    if f1 == 24 and player == 1:
        f1 = -1
    if f2 == 24 and player == 1:
        f2 = -1
    if hrf:
        t1, t2 = f1 + high * player, f2 + low * player
    else:
        t1, t2 = f1 + low * player, f2 + high * player
    if t1 >= 24 or t1 <= -1:
        t1 = -1
    if t2 >= 24 or t2 <= -1:
        t2 = -1
    if f1 == 24:
        f1 = -1
    if f2 == 24:
        f2 = -1
    return [(f1, t1)] if single else [(f1, t1), (f2, t2)]


def legal_action_set(state: Board, roll: Tuple[int, int], player: int) -> set:
    """The reference's legal action-index set {encode(m)} plus the explicit
    no-op when no move exists (see die_e_tpu.envs.backgammon.legal_mask)."""
    moves = get_valid_moves(state, roll, player)
    if not moves:
        return {NOOP_ACTION}
    return {encode(m, roll) for m in moves}


# --- seeded dice stream, bit-identical to die_e_tpu.envs.backgammon ---------

_M = 0xFFFFFFFF


def _mix32(x: int) -> int:
    x &= _M
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & _M
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & _M
    x ^= x >> 16
    return x


def dice_from_stream(seed: int, cnt: int, salt: int) -> Tuple[int, int]:
    base = _mix32(
        (seed & _M)
        ^ _mix32((cnt * 0x9E3779B9) & _M)
        ^ _mix32((salt * 0x7F4A7C15) & _M)
    )
    d0 = (base % 6) + 1
    d1 = (_mix32(base ^ 0xDEADBEEF) % 6) + 1
    return (d0, d1)


class OracleGame:
    """Full game-state oracle mirroring BgState transitions, for seeded
    trajectory-parity tests (SURVEY.md section 7 stage 2)."""

    def __init__(self, seed: int):
        self.board = initial_board()
        self.player = -1
        self.second = False
        self.seed = seed & _M
        self.cnt = 1
        self.roll = dice_from_stream(self.seed, 0, 0)

    def legal_actions(self) -> set:
        return legal_action_set(self.board, self.roll, self.player)

    def step(self, action: int):
        moves = decode(action, self.roll, self.player)
        self.board = get_next_state(self.board, moves, self.player)
        doubles = self.roll[0] == self.roll[1]
        goes_second = doubles and (not self.second) and action != NOOP_ACTION
        if goes_second:
            self.second = True
        else:
            self.second = False
            self.player = -self.player
            self.roll = dice_from_stream(self.seed, self.cnt, action)
            self.cnt += 1

    def winner(self) -> int:
        return check_winner(self.board)
