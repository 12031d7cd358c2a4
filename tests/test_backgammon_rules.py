"""Rules-engine tests ported from the reference integration suite
(/root/reference/tests/backgammon_test.rs), exercised against BOTH the
vectorized JAX env and the Python parity oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from die_e_tpu.envs import backgammon as bg
from parity import py_oracle as oracle

INITIAL = list(bg.INITIAL_BOARD)


def apply_moves_jax(board, bar, off, player, moves):
    b = jnp.asarray(board, jnp.int32)
    br = jnp.asarray(bar, jnp.int32)
    of = jnp.asarray(off, jnp.int32)
    p = jnp.asarray(player, jnp.int32)
    for frm, to in moves:
        b, br, of = bg.apply_submove(
            b, br, of, p, jnp.int32(frm), jnp.int32(to), jnp.asarray(True)
        )
    return list(np.asarray(b)), tuple(np.asarray(br)), tuple(np.asarray(of))


# (name, start_board, bar, off, player, moves, expected_board, exp_bar, exp_off)
GET_NEXT_STATE_CASES = [
    # backgammon_test.rs:29-41
    ("empty_actions", INITIAL, (0, 0), (0, 0), 1, [], INITIAL, (0, 0), (0, 0)),
    # :43-56
    ("normal_move1", INITIAL, (0, 0), (0, 0), -1, [(23, 21), (23, 20)],
     [2, 0, 0, 0, 0, -5, 0, -3, 0, 0, 0, 5, -5, 0, 0, 0, 3, 0, 5, 0, -1, -1, 0, 0],
     (0, 0), (0, 0)),
    # :58-71
    ("normal_move2", INITIAL, (0, 0), (0, 0), 1, [(0, 3), (0, 3)],
     [0, 0, 0, 2, 0, -5, 0, -3, 0, 0, 0, 5, -5, 0, 0, 0, 3, 0, 5, 0, 0, 0, 0, -2],
     (0, 0), (0, 0)),
    # :73-90 player1 hits
    ("player1_hit",
     [0] * 18 + [-5, 0, 0, 1, 0, 1], (0, 0), (0, 0), -1,
     [(18, 21), (18, 23)],
     [0] * 18 + [-3, 0, 0, -1, 0, -1], (0, 2), (0, 0)),
    # :92-109 player2 hits
    ("player2_hit",
     [0, 0, 0, 0, 0, 5, 0, 0, -1, 0, -1] + [0] * 13, (0, 0), (0, 0), 1,
     [(5, 8), (5, 10)],
     [0, 0, 0, 0, 0, 3, 0, 0, 1, 0, 1] + [0] * 13, (2, 0), (0, 0)),
    # :111-128 collecting p1
    ("collect_p1", [0] * 23 + [-2], (0, 0), (0, 0), -1, [(23, -1), (23, -1)],
     [0] * 24, (0, 0), (2, 0)),
    # :130-147 collecting p2
    ("collect_p2", [0, 0, 0, 0, 0, 5] + [0] * 18, (0, 0), (0, 0), 1,
     [(5, -1), (5, -1)],
     [0, 0, 0, 0, 0, 3] + [0] * 18, (0, 0), (0, 2)),
    # :149-166 bar p1
    ("bar_p1", [0] * 24, (2, 0), (0, 0), -1, [(-1, 23), (-1, 20)],
     [0] * 20 + [-1, 0, 0, -1], (0, 0), (0, 0)),
    # :168-185 bar p2
    ("bar_p2", [0] * 24, (0, 2), (0, 0), 1, [(-1, 0), (-1, 3)],
     [1, 0, 0, 1] + [0] * 20, (0, 0), (0, 0)),
    # :187-204 bar + hit p1
    ("bar_hit_p1", [0] * 20 + [1, 0, 0, 1], (2, 0), (0, 0), -1,
     [(-1, 23), (-1, 20)],
     [0] * 20 + [-1, 0, 0, -1], (0, 2), (0, 0)),
    # :206-223 bar + hit p2
    ("bar_hit_p2", [-1, 0, 0, -1] + [0] * 20, (0, 2), (0, 0), 1,
     [(-1, 0), (-1, 3)],
     [1, 0, 0, 1] + [0] * 20, (2, 0), (0, 0)),
    # :225-242 bar + hit p2, busy board
    ("bar_hit_p2_2",
     [-1, -1, -1, 1, -1, -3, -3, 0, 0, 1, 0, 0, -1, 0, -1, -1, 4, 1, 5, -1, -1, 0, 0, 1],
     (0, 2), (0, 0), 1, [(-1, 3), (-1, 4)],
     [-1, -1, -1, 2, 1, -3, -3, 0, 0, 1, 0, 0, -1, 0, -1, -1, 4, 1, 5, -1, -1, 0, 0, 1],
     (1, 0), (0, 0)),
]


@pytest.mark.parametrize(
    "case", GET_NEXT_STATE_CASES, ids=[c[0] for c in GET_NEXT_STATE_CASES]
)
def test_get_next_state_oracle(case):
    _, board, bar, off, player, moves, eb, ebar, eoff = case
    res = oracle.get_next_state((list(board), bar, off), moves, player)
    assert res[0] == list(eb)
    assert res[1] == ebar
    assert res[2] == eoff


@pytest.mark.parametrize(
    "case", GET_NEXT_STATE_CASES, ids=[c[0] for c in GET_NEXT_STATE_CASES]
)
def test_get_next_state_jax(case):
    _, board, bar, off, player, moves, eb, ebar, eoff = case
    b, br, of = apply_moves_jax(board, bar, off, player, moves)
    assert b == list(eb)
    assert br == ebar
    assert of == eoff


def test_initial_state():
    # backgammon_test.rs:6-24
    s = bg.init(0)
    assert list(np.asarray(s.board)) == INITIAL
    assert int(s.player) == -1
    assert not bool(s.second)
    r = np.asarray(s.roll)
    assert (1 <= r).all() and (r <= 6).all()


def test_check_win():
    # backgammon_test.rs:556-579
    s = bg.make_state(INITIAL, (0, 0), (0, 0), (1, 2), -1)
    assert int(bg.winner(s)) == 0
    s1 = bg.make_state([0] * 24, (0, 0), (15, 0), (1, 2), -1)
    assert int(bg.winner(s1)) == -1
    s2 = bg.make_state([0] * 24, (0, 0), (0, 15), (1, 2), 1)
    assert int(bg.winner(s2)) == 1
    assert oracle.check_winner(([0] * 24, (0, 0), (15, 0))) == -1
    assert oracle.check_winner(([0] * 24, (0, 0), (0, 15))) == 1


def test_is_collectible():
    # backgammon_test.rs:515-554
    init = (list(INITIAL), (0, 0), (0, 0))
    assert not oracle.is_collectible(init, -1)
    assert not oracle.is_collectible(init, 1)
    board = [0] * 24
    board[0] = -1
    board[23] = 1
    st = (board, (0, 0), (0, 0))
    assert oracle.is_collectible(st, -1)
    assert oracle.is_collectible(st, 1)
    st_bar = (board, (1, 1), (0, 0))
    assert not oracle.is_collectible(st_bar, -1)
    assert not oracle.is_collectible(st_bar, 1)


def board_with(**kwargs):
    b = [0] * 24
    for k, v in kwargs.items():
        b[int(k[1:])] = v
    return b


def test_get_valid_moves_cases():
    """get_valid_moves end-to-end (backgammon_test.rs:866-916) on the
    oracle; the mask kernel is cross-checked in test_mask_parity."""
    # no moves possible (:870-879)
    b = board_with(p20=-1, p19=2, p18=2)
    assert oracle.get_valid_moves((b, (0, 0), (0, 0)), (1, 2), -1) == []
    # inverted roll equivalence (:881-894)
    b = board_with(p20=-1)
    m1 = oracle.get_valid_moves((b, (0, 0), (0, 0)), (1, 2), -1)
    m2 = oracle.get_valid_moves((b, (0, 0), (0, 0)), (2, 1), -1)
    assert m1 == m2
    # normal roll (:896-903)
    assert m1 == [[(20, 19), (19, 17)]]
    # entry moves (:905-914)
    b = board_with(p21=2)
    m = oracle.get_valid_moves((b, (1, 0), (0, 0)), (1, 2), -1)
    assert m == [[(-1, 23)], [(-1, 22)]]
    # doubles are played as two plies of (at most) two moves
    # (backgammon_logic.rs:179-186 + design note alpha_no_parallel.rs:40-43;
    # the reference's own doubles test at backgammon_test.rs:918-925 is stale)
    b = board_with(p20=-1)
    m = oracle.get_valid_moves((b, (0, 0), (0, 0)), (1, 1), -1)
    assert m == [[(20, 19), (19, 18)]]


def test_sequence_enumeration_order():
    """Tree flattening order incl. first-seen dedup
    (backgammon_test.rs:580-735)."""
    # multiple action nodes (:657-674)
    b = board_with(p20=-1, p19=2, p16=-1)
    seqs = oracle._extract(oracle._action_trees([2, 1], (b, (0, 0), (0, 0)), -1))
    assert seqs == [
        [(16, 15), (15, 13)],
        [(16, 15), (20, 18)],
        [(16, 14), (14, 13)],
        [(20, 18), (16, 15)],
        [(20, 18), (18, 17)],
    ]
    # duplicate removal (:700-716)
    b = board_with(p20=-1)
    got = oracle.get_valid_moves((b, (0, 0), (0, 0)), (2, 1), -1)
    assert got == [[(20, 19), (19, 17)]]
    # hit makes states distinct (:718-734)
    b = board_with(p20=-1, p19=1)
    got = oracle.get_valid_moves((b, (0, 0), (0, 0)), (2, 1), -1)
    assert got == [[(20, 19), (19, 17)], [(20, 18), (18, 17)]]


def test_entry_moves():
    # backgammon_test.rs:737-864
    b = board_with(p21=2)
    assert oracle._entry_moves([3], (b, (1, 0), (0, 0)), -1) == []
    b = board_with()
    assert oracle._entry_moves([3], (b, (1, 0), (0, 0)), -1) == [(3, (-1, 21))]
    b = board_with(p19=2)
    assert oracle._entry_moves([3, 2], (b, (1, 0), (0, 0)), -1) == [
        (2, (-1, 22)),
        (3, (-1, 21)),
    ]
    b = board_with(p2=-2)
    assert oracle._entry_moves([3], (b, (0, 1), (0, 0)), 1) == []
    b = board_with()
    assert oracle._entry_moves([3], (b, (0, 1), (0, 0)), 1) == [(3, (-1, 2))]
    b = board_with(p4=-2)
    assert oracle._entry_moves([3, 2], (b, (0, 1), (0, 0)), 1) == [
        (2, (-1, 1)),
        (3, (-1, 2)),
    ]


def test_normal_moves_bearoff():
    # backgammon_test.rs:252-513 (representative set incl. bear-off rules)
    b = board_with(p20=-1)
    assert oracle._normal_moves([1], (b, (0, 0), (0, 0)), -1) == [(1, (20, 19))]
    b = board_with(p20=-1, p19=2)
    assert oracle._normal_moves([1], (b, (0, 0), (0, 0)), -1) == []
    # exact collection
    b = board_with(p0=-1)
    assert oracle._normal_moves([1], (b, (0, 0), (0, 0)), -1) == [(1, (0, -1))]
    # higher-die collection
    b = board_with(p0=-1)
    assert oracle._normal_moves([6], (b, (0, 0), (0, 0)), -1) == [(6, (0, -1))]
    # player 2 exact / higher
    b = board_with(p23=1)
    assert oracle._normal_moves([1], (b, (0, 0), (0, 0)), 1) == [(1, (23, -1))]
    b = board_with(p23=1)
    assert oracle._normal_moves([6], (b, (0, 0), (0, 0)), 1) == [(6, (23, -1))]


def test_step_turn_and_dice_logic():
    """apply_move turn bookkeeping (backgammon_logic.rs:176-196): doubles
    become two plies; no-op skips the turn."""
    s = bg.init(42)
    # force a non-doubles roll
    s = s.replace(roll=jnp.array([2, 1], jnp.int32))
    mask = np.asarray(bg.legal_mask(s))
    a = int(np.argmax(mask))
    s2 = bg.step(s, a)
    assert int(s2.player) == 1 and not bool(s2.second)
    # doubles: first ply keeps player and roll, sets second
    s = s.replace(roll=jnp.array([1, 1], jnp.int32))
    mask = np.asarray(bg.legal_mask(s))
    a = int(np.argmax(mask))
    if a != bg.NOOP_ACTION:
        s2 = bg.step(s, a)
        assert int(s2.player) == -1 and bool(s2.second)
        assert list(np.asarray(s2.roll)) == [1, 1]
        # second ply passes the turn
        mask2 = np.asarray(bg.legal_mask(s2))
        s3 = bg.step(s2, int(np.argmax(mask2)))
        assert int(s3.player) == 1 and not bool(s3.second)
    # skip (no-op) always passes the turn
    s2 = bg.step(s, bg.NOOP_ACTION)
    assert int(s2.player) == 1 and not bool(s2.second)


def test_observe_layout():
    """as_tensor channel semantics (backgammon_logic.rs:198-252), NHWC."""
    s = bg.make_state(INITIAL, (1, 2), (3, 4), (5, 6), -1, second=True)
    obs = np.asarray(bg.observe(s))
    assert obs.shape == (4, 6, 6)
    assert obs[..., 0].flatten().tolist() == [float(x) for x in INITIAL]
    assert (obs[..., 1] == -1).all()
    hit = obs[..., 2].flatten()
    assert (hit[:12] == 1).all() and (hit[12:] == 2).all()
    col = obs[..., 3].flatten()
    assert (col[:12] == 3).all() and (col[12:] == 4).all()
    roll = obs[..., 4].flatten()
    assert (roll[:12] == 5).all() and (roll[12:] == 6).all()
    assert (obs[..., 5] == 1).all()
