"""The central equivalence test: the fixed-shape [1352] legal-action mask
kernel must produce exactly the reference's move set
{encode(m) for m in get_valid_moves()} for arbitrary positions
(SURVEY.md section 7, hard part 1).

Checked against the tree-based Python oracle on the reference test
positions plus randomized fuzzing over plausible boards.
"""

import random

import jax
import numpy as np
import pytest

from die_e_tpu.envs import backgammon as bg
from parity import py_oracle as oracle


def mask_jax(board, bar, off, roll, player):
    s = bg.make_state(board, bar, off, roll, player)
    return np.asarray(jax.jit(bg.legal_mask)(s))


def assert_mask_matches(board, bar, off, roll, player, msg=""):
    want = oracle.legal_action_set((list(board), tuple(bar), tuple(off)), roll, player)
    got_mask = mask_jax(board, bar, off, roll, player)
    got = set(np.nonzero(got_mask)[0].tolist())
    assert got == want, (
        f"mask mismatch {msg} roll={roll} player={player}\n"
        f"board={list(board)} bar={bar} off={off}\n"
        f"only_jax={sorted(got - want)} only_oracle={sorted(want - got)}\n"
        f"jax_decodes={[oracle.decode(a, roll, player) for a in sorted(got - want)]}\n"
        f"oracle_decodes={[oracle.decode(a, roll, player) for a in sorted(want - got)]}"
    )


def board_with(**kwargs):
    b = [0] * 24
    for k, v in kwargs.items():
        b[int(k[1:])] = v
    return b


FIXED_CASES = [
    # initial position, assorted rolls
    (list(bg.INITIAL_BOARD), (0, 0), (0, 0), (1, 2), -1),
    (list(bg.INITIAL_BOARD), (0, 0), (0, 0), (6, 6), -1),
    (list(bg.INITIAL_BOARD), (0, 0), (0, 0), (3, 5), 1),
    (list(bg.INITIAL_BOARD), (0, 0), (0, 0), (4, 4), 1),
    # reference get_valid_moves cases (backgammon_test.rs:866-925)
    (board_with(p20=-1, p19=2, p18=2), (0, 0), (0, 0), (1, 2), -1),
    (board_with(p20=-1), (0, 0), (0, 0), (1, 2), -1),
    (board_with(p20=-1), (0, 0), (0, 0), (2, 1), -1),
    (board_with(p21=2), (1, 0), (0, 0), (1, 2), -1),
    (board_with(p20=-1), (0, 0), (0, 0), (1, 1), -1),
    # bear-off positions incl. flexible die attribution
    (board_with(p0=-1, p1=-1), (0, 0), (13, 0), (6, 5), -1),
    (board_with(p0=-1, p4=-1), (0, 0), (13, 0), (6, 1), -1),
    (board_with(p0=-2, p5=-3), (0, 0), (10, 0), (6, 6), -1),
    (board_with(p23=1, p22=1), (0, 0), (0, 13), (6, 5), 1),
    (board_with(p23=1, p20=1), (0, 0), (0, 13), (6, 1), 1),
    (board_with(p18=2, p19=-2, p20=1), (0, 0), (0, 12), (6, 3), 1),
    # mixed bear-off with opponent in home board
    (board_with(p3=5, p4=-1, p2=-1), (0, 0), (13, 0), (6, 2), -1),
    (board_with(p5=-1, p3=-1, p4=2), (0, 0), (13, 0), (6, 4), -1),
    # bar entries with partial blocks
    (board_with(p18=2, p19=2, p20=2, p21=2, p22=2, p23=2), (2, 0), (0, 0), (3, 5), -1),
    (board_with(p0=-2, p1=-2, p2=-2, p3=-2, p4=-2, p5=-2), (0, 2), (0, 0), (3, 5), 1),
    (board_with(p21=1), (1, 0), (0, 0), (3, 3), -1),
    # hit-makes-distinct (backgammon_test.rs:718-734)
    (board_with(p20=-1, p19=1), (0, 0), (0, 0), (2, 1), -1),
    # regression (parity sweep, seed 1994076408 step 86): an action legal
    # only under the non-block die attribution whose block-attribution
    # first move is illegal — the duplicate-state signature must be taken
    # under the LEGAL attribution or dedup misses the transposition
    (
        [-6, 0, 0, 4, -1, -2, 1, 2, 0, 0, 0, 0,
         0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 3, 3],
        (0, 0), (6, 0), (6, 5), -1,
    ),
]


@pytest.mark.parametrize("i", range(len(FIXED_CASES)))
def test_mask_fixed_positions(i):
    board, bar, off, roll, player = FIXED_CASES[i]
    assert_mask_matches(board, bar, off, roll, player, msg=f"fixed[{i}]")


def random_position(rng: random.Random):
    """A plausible position: 15 checkers per player split over board / bar /
    off, in reachable-looking configurations."""
    board = [0] * 24
    state = {}
    for player in (-1, 1):
        n = 15
        off = rng.randint(0, 14) if rng.random() < 0.3 else 0
        n -= off
        bar = rng.choice([0, 0, 0, 1, 2]) if n > 0 else 0
        bar = min(bar, n)
        n -= bar
        # sometimes force a near-bear-off shape
        if rng.random() < 0.35:
            pts = range(0, 6) if player == -1 else range(18, 24)
        else:
            pts = range(24)
        pts = list(pts)
        while n > 0:
            p = rng.choice(pts)
            if board[p] * player < 0:
                continue  # occupied by opponent
            add = min(n, rng.randint(1, 5))
            board[p] += add * player
            n -= add
        state[player] = (bar, off)
    bar = (state[-1][0], state[1][0])
    off = (state[-1][1], state[1][1])
    roll = (rng.randint(1, 6), rng.randint(1, 6))
    player = rng.choice([-1, 1])
    return board, bar, off, roll, player


@pytest.mark.parametrize("seed", range(8))
def test_mask_fuzz(seed):
    rng = random.Random(1234 + seed)
    for trial in range(80):
        board, bar, off, roll, player = random_position(rng)
        assert_mask_matches(board, bar, off, roll, player, msg=f"fuzz s{seed} t{trial}")


@pytest.mark.parametrize("seed", range(4))
def test_mask_fuzz_doubles(seed):
    """Doubles collapse the two attribution blocks — the canonical filter
    and duplicate classes degenerate; fuzz them separately."""
    rng = random.Random(777 + seed)
    for trial in range(40):
        board, bar, off, roll, player = random_position(rng)
        d = rng.randint(1, 6)
        assert_mask_matches(board, bar, off, (d, d), player,
                            msg=f"dfuzz s{seed} t{trial}")


@pytest.mark.parametrize("seed", range(4))
def test_mask_fuzz_bearoff(seed):
    """Bear-off positions carry the flexible die attribution and the
    single-vs-chain duplicate class; fuzz home-board-only shapes."""
    rng = random.Random(4242 + seed)
    for trial in range(40):
        board = [0] * 24
        # opponent checkers inside the bear-off home boards exercise the
        # signed-sum higher-die rule and attribution-dependent signatures
        pts_m = range(0, 6) if trial % 2 == 0 else range(0, 9)
        pts_p = range(18, 24) if trial % 2 == 0 else range(15, 24)
        for player, pts in ((-1, pts_m), (1, pts_p)):
            n = rng.randint(1, 15)
            off = 15 - n
            while n > 0:
                p = rng.choice(list(pts))
                if board[p] * player < 0:
                    continue
                add = min(n, rng.randint(1, 5))
                board[p] += add * player
                n -= add
            if player == -1:
                off_m = off
            else:
                off_p = off
        roll = (rng.randint(1, 6), rng.randint(1, 6))
        player = rng.choice([-1, 1])
        assert_mask_matches(board, (0, 0), (off_m, off_p), roll, player,
                            msg=f"bfuzz s{seed} t{trial}")


def test_mask_batched_consistency():
    """vmapped mask over a batch == per-state masks (lockstep stepping)."""
    rng = random.Random(99)
    cases = [random_position(rng) for _ in range(16)]
    states = [bg.make_state(*c) for c in cases]
    batched = jax.tree.map(lambda *xs: np.stack(xs), *states)
    batched = jax.tree.map(jax.numpy.asarray, batched)
    masks = np.asarray(jax.jit(jax.vmap(bg.legal_mask))(batched))
    for i, c in enumerate(cases):
        single = mask_jax(*c)
        assert (masks[i] == single).all()


def test_legal_digits_matches_legal_single():
    """legal_digits (the mask kernel's vectorized stage-1 form) equals
    legal_single over the full digit axis for random positions, all die
    values, both players — including positions with bar checkers and
    bear-off shapes (the per-state hoisted predicates must not change any
    digit's verdict)."""
    rng = random.Random(31337)
    f_axis = jax.numpy.arange(26)

    def single_all(board, bar, off, player, die):
        return jax.vmap(
            lambda f: bg.legal_single(board, bar, off, player, die, f)
        )(f_axis)

    fast = jax.jit(bg.legal_digits)
    slow = jax.jit(single_all)
    for trial in range(60):
        board, bar, off, _, player = random_position(rng)
        b = jax.numpy.asarray(board, jax.numpy.int8)
        br = jax.numpy.asarray(bar, jax.numpy.int8)
        of = jax.numpy.asarray(off, jax.numpy.int8)
        for die in range(1, 7):
            got = np.asarray(fast(b, br, of, player, die))
            want = np.asarray(slow(b, br, of, player, die))
            assert (got == want).all(), (
                f"trial {trial} die {die} player {player}: "
                f"digits {np.nonzero(got != want)[0].tolist()} differ\n"
                f"board={board} bar={bar} off={off}"
            )
