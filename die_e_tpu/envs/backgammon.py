"""Vectorized backgammon environment (TPU-native).

Reimplements the semantics of the reference Rust engine
(/root/reference/src/backgammon/backgammon_logic.rs and encoding.rs) as pure,
fixed-shape JAX functions so thousands of games step in lockstep under ``jit``.

Key design difference vs the reference: legal-move enumeration.  The reference
builds per-roll recursive action *trees* (ActionNode, backgammon_logic.rs:544-
774), flattens them to sequences and removes sequences that reach duplicate
states (remove_duplicate_states, :753-774).  Here the same move-set semantics
are produced as a `[1352]` boolean mask in one fused kernel:

1. decode every action index to its (from1,to1,from2,to2) sub-moves
   (mirror of decode, backgammon_logic.rs:361-401),
2. build single-move legality tables for the 2x26 possible first moves and
   the 2x26x26 (die_order, from1, from2) second moves (mirror of
   get_entry_moves/get_normal_moves/is_collectible, :555-703),
3. keep only actions that are the *canonical encoding* of their decoded
   move sequence (mirror of encode, :262-359) so duplicate action values
   (e.g. flexible die attribution of bear-offs) collapse exactly as the
   reference's encode does,
4. deduplicate actions that reach identical states, keeping the one the
   reference's depth-first tree enumeration would emit first (mirror of
   remove_duplicate_states, :753-774) via an exact packed state signature
   and a lexicographic sort.

Dice use a counter-based seeded stream (splitmix-style uint32 mixing) rather
than the reference's irreproducible ``thread_rng`` (backgammon_logic.rs:100-
104); the C++ parity oracle implements the identical stream, which is what
makes exact seeded trajectory parity testable (SURVEY.md section 7, hard part
3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from die_e_tpu.envs.base import Env, GameSpec

NUM_ACTIONS = 1352
NOOP_ACTION = 1351  # encode(empty move), backgammon_logic.rs:267

# Static per-action index tables (host numpy so every use of them compiles
# to static gathers/selects — on TPU a dynamic [B,1352] gather is ~70x the
# cost of a constant-index one).  Action layout (reference encode scheme
# comment, backgammon_logic.rs:290-297): id = f1 + 26*f2 (+676 if the low
# roll plays first); digit 24 = bar, second digit 25 = no second move.
_ACT = np.arange(NUM_ACTIONS, dtype=np.int32)
_HRF = _ACT < 676                      # high-roll-first block
_BASE = np.where(_HRF, _ACT, _ACT - 676)
_F1D = (_BASE % 26).astype(np.int32)   # first-move from digit
_F2D = (_BASE // 26).astype(np.int32)  # second-move from digit (25 = none)
_SINGLE = _F2D == 25
_DSEL = np.where(_HRF, 0, 1).astype(np.int32)  # die-attribution index
_F1M = np.where(_F1D == 24, -1, _F1D).astype(np.int32)
_F2M = np.where(_F2D == 24, -1, _F2D).astype(np.int32)
# transposition partner ids (digits swapped), both blocks
_T_HI = (_F2D + 26 * _F1D).astype(np.int32)
_T_LO = (_T_HI + 676).astype(np.int32)

SPEC = GameSpec(
    name="backgammon",
    num_actions=NUM_ACTIONS,
    obs_shape=(4, 6, 6),
    conv_output_size=24,
    n_filters=256,
    n_res_blocks=19,
    is_deterministic=False,
    noop_action=NOOP_ACTION,
    # as_tensor planes are checker counts / die faces / flags — small exact
    # integers (backgammon_logic.rs:198-252), int8 round-trips losslessly
    obs_int8=True,
)

# Initial board, reference backgammon_logic.rs:80-94.  Negative = player -1.
INITIAL_BOARD = (
    2, 0, 0, 0, 0, -5, 0, -3, 0, 0, 0, 5,
    -5, 0, 0, 0, 3, 0, 5, 0, 0, 0, 0, -2,
)


@struct.dataclass
class BgState:
    """Unbatched backgammon state.

    board: [24] i32 signed piece counts (reference Board .0)
    bar:   [2] i32, bar[0] = player -1's hit pieces, bar[1] = player +1's
    off:   [2] i32 borne-off counts
    roll:  [2] i32 current dice (1..6)
    player: i32 scalar in {-1, +1}
    second: bool scalar, doubles second-play flag (is_second_play)
    seed:  u32 scalar, per-game dice stream seed
    cnt:   i32 scalar, dice stream cursor (number of rolls made)
    """

    board: jnp.ndarray
    bar: jnp.ndarray
    off: jnp.ndarray
    roll: jnp.ndarray
    player: jnp.ndarray
    second: jnp.ndarray
    seed: jnp.ndarray
    cnt: jnp.ndarray


# ---------------------------------------------------------------------------
# Dice stream
# ---------------------------------------------------------------------------


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 finalizer on uint32 (mirrored bit-for-bit in the C++
    oracle, parity/oracle.cpp)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def dice_from_stream(seed, cnt, salt) -> jnp.ndarray:
    """Deterministic dice pair for (seed, cursor, salt).  Replaces the
    reference's thread_rng roll_die (backgammon_logic.rs:100-104) with a
    reproducible contract shared with the parity oracle."""
    base = _mix32(
        seed.astype(jnp.uint32)
        ^ _mix32(cnt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        ^ _mix32(salt.astype(jnp.uint32) * jnp.uint32(0x7F4A7C15))
    )
    d0 = (base % jnp.uint32(6)).astype(jnp.int32) + 1
    d1 = ((_mix32(base ^ jnp.uint32(0xDEADBEEF))) % jnp.uint32(6)).astype(jnp.int32) + 1
    return jnp.stack([d0, d1])


# ---------------------------------------------------------------------------
# State construction
# ---------------------------------------------------------------------------


def init(seed) -> BgState:
    """Fresh game: reference new() (backgammon_logic.rs:80-94) + first
    roll_die() as done by self-play setup (alpha_parallel.rs:103-111)."""
    seed = jnp.asarray(seed, jnp.uint32)
    roll = dice_from_stream(seed, jnp.int32(0), jnp.int32(0))
    return BgState(
        board=jnp.array(INITIAL_BOARD, jnp.int32),
        bar=jnp.zeros(2, jnp.int32),
        off=jnp.zeros(2, jnp.int32),
        roll=roll,
        player=jnp.int32(-1),
        second=jnp.asarray(False),
        seed=seed,
        cnt=jnp.int32(1),
    )


def make_state(board, bar, off, roll, player, second=False, seed=0, cnt=1) -> BgState:
    """Arbitrary position (test helper, ~ init_with_fields,
    backgammon_logic.rs:419-427)."""
    return BgState(
        board=jnp.asarray(board, jnp.int32),
        bar=jnp.asarray(bar, jnp.int32),
        off=jnp.asarray(off, jnp.int32),
        roll=jnp.asarray(roll, jnp.int32),
        player=jnp.asarray(player, jnp.int32),
        second=jnp.asarray(second, bool),
        seed=jnp.asarray(seed, jnp.uint32),
        cnt=jnp.asarray(cnt, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Action codec (reference decode backgammon_logic.rs:361-401,
# encode :262-359; the duplicated inherent impl lives in encoding.rs)
# ---------------------------------------------------------------------------


def _to_of(f, die, player):
    """Destination of a sub-move from digit ``f`` (0..23 board, 24 bar) with
    ``die`` for ``player``; -1 = bear-off.  Mirrors decode's arithmetic
    (backgammon_logic.rs:383-398)."""
    f_conv = jnp.where((f == 24) & (player == 1), -1, f)
    t = f_conv + die * player
    return jnp.where((t >= 24) | (t <= -1), -1, t)


def decode_action(action, roll, player):
    """action index -> (f1, t1, f2, t2, single, noop, die1, die2).

    f values use -1 for the bar (reference Actions convention); f2 is
    meaningless when ``single``.  Mirrors decode (backgammon_logic.rs:361-401).
    """
    action = jnp.asarray(action, jnp.int32)
    high = jnp.maximum(roll[0], roll[1])
    low = jnp.minimum(roll[0], roll[1])
    hrf = action < 676
    base = jnp.where(hrf, action, action - 676)
    f1d = base % 26
    f2d = base // 26
    single = f2d == 25
    noop = action == NOOP_ACTION
    die1 = jnp.where(hrf, high, low)
    die2 = jnp.where(hrf, low, high)
    t1 = _to_of(f1d, die1, player)
    t2 = _to_of(f2d, die2, player)
    f1 = jnp.where(f1d == 24, -1, f1d)
    f2 = jnp.where(f2d == 24, -1, f2d)
    return f1, t1, f2, t2, single, noop, die1, die2


def _min_roll(f, t):
    """Minimum die value able to play sub-move (f, t)
    (backgammon_logic.rs:277-285)."""
    mr_bar = jnp.where(t < 6, t + 1, 24 - t)
    mr_coll = jnp.where(f < 6, f + 1, 24 - f)
    mr_norm = jnp.abs(f - t)
    return jnp.where(f < 0, mr_bar, jnp.where(t < 0, mr_coll, mr_norm))


def encode_move(f1, t1, f2, t2, single, roll, player):
    """Move sequence -> canonical action index.  Mirrors encode
    (backgammon_logic.rs:262-359).  ``single`` selects a 1-move sequence;
    the empty sequence is NOOP_ACTION and handled by callers."""
    del player  # encoding does not depend on the player
    low = jnp.minimum(roll[0], roll[1])
    min1 = _min_roll(f1, t1)
    min2 = jnp.where(single, 0, _min_roll(f2, t2))
    is_coll1 = (t1 < 0) & (f1 >= 0)
    is_coll2 = (t2 < 0) & (f2 >= 0)
    # low-roll flags are raised only by bar and normal moves (:301-349),
    # and flag1 is reset for single-move sequences (:352)
    flag1 = (~is_coll1) & (min1 == low) & (~single)
    flag2 = (~single) & (~is_coll2) & (min2 == low)
    hrf = jnp.where(
        flag1,
        False,
        jnp.where(flag2, True, jnp.where(min2 != 0, min1 >= min2, min1 > low)),
    )
    digit1 = jnp.where(f1 < 0, 24, f1)
    digit2 = jnp.where(single, 25, jnp.where(f2 < 0, 24, f2))
    enc = digit1 + 26 * digit2
    return jnp.where(hrf, enc, enc + 676).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Board transition (reference get_next_state backgammon_logic.rs:467-517)
# ---------------------------------------------------------------------------


def _cell(board, idx):
    """board[idx] as a one-hot masked reduction over the 24-cell axis.

    A dynamic gather lowers to a slow scatter/gather loop on TPU (measured
    cost cliff, see module doc); a 24-wide masked reduction fuses into the
    surrounding elementwise work."""
    oh = jnp.arange(24) == idx
    return jnp.sum(jnp.where(oh, board, 0))


def apply_submove(board, bar, off, player, frm, to, valid):
    """Apply one sub-move (f -> t), masked by ``valid``.

    frm == -1 means entry from the bar, to == -1 means bear-off; hitting a
    lone opposing checker sends it to the opponent's bar.  Mirrors
    get_next_state's per-action body (backgammon_logic.rs:469-515).

    All cell addressing is one-hot select/update (no dynamic gathers or
    scatters — the TPU cost cliff); ``to`` and ``frm`` never address the
    same cell when both writes are live (a die is >= 1, and entry/bear-off
    mask the other write), so the where-writes commute with the original
    .at[] forms.
    """
    own = (player + 1) // 2
    opp = 1 - own
    is_collect = (to < 0) & (frm >= 0)
    is_entry = frm < 0
    toc = jnp.clip(to, 0, 23)
    frmc = jnp.clip(frm, 0, 23)
    cells = jnp.arange(24)
    oh_to = cells == toc
    oh_frm = cells == frmc
    b_to = jnp.sum(jnp.where(oh_to, board, 0))
    hit = valid & (~is_collect) & (b_to == -player)
    write_to = valid & (~is_collect)
    new_to = jnp.where(hit, player, b_to + player)
    board = jnp.where(oh_to & write_to, new_to, board)
    board = board - jnp.where(oh_frm & valid & (~is_entry), player, 0)
    sides = jnp.arange(2)
    bar = bar - jnp.where((sides == own) & valid & is_entry, 1, 0)
    bar = bar + jnp.where((sides == opp) & hit, 1, 0)
    off = off + jnp.where((sides == own) & valid & is_collect, 1, 0)
    return board, bar, off


# ---------------------------------------------------------------------------
# Single-move legality (reference get_entry_moves :662-703,
# get_normal_moves :555-636, is_collectible :638-659)
# ---------------------------------------------------------------------------


def _is_collectible(board, bar, player):
    """All checkers in the home board and none on the bar
    (backgammon_logic.rs:638-659)."""
    own = (player + 1) // 2
    idx = jnp.arange(24)
    neg_outside = jnp.any(jnp.where(idx >= 6, board, 0) < 0)
    pos_outside = jnp.any(jnp.where(idx < 18, board, 0) > 0)
    blocked = jnp.where(player < 0, neg_outside, pos_outside)
    bar_own = jnp.sum(jnp.where(jnp.arange(2) == own, bar, 0))
    return (bar_own == 0) & (~blocked)


def legal_single(board, bar, off, player, die, f):
    """Is the sub-move from digit ``f`` (0..23 board, 24 bar) with ``die``
    legal in this position?  Exactly the push conditions of the reference's
    move generators (entry :668-681, normal :600-616, bear-off :562-597)."""
    del off
    own = (player + 1) // 2
    has_bar = jnp.sum(jnp.where(jnp.arange(2) == own, bar, 0)) > 0

    # --- entry from the bar (get_entry_moves :668-681).  Cell reads are
    # one-hot reductions (_cell): dynamic gathers over the board axis hit
    # the TPU cost cliff once this is vmapped over [B, 2, 26, 26]
    e = jnp.where(player < 0, 24 - die, die - 1)
    b_e = _cell(board, e)
    entry_open = jnp.where(player < 0, b_e < 2, b_e > -2)
    legal_entry = has_bar & (f == 24) & entry_open

    on_board = (f >= 0) & (f <= 23)
    fc = jnp.clip(f, 0, 23)
    t_raw = fc + die * player
    in_range = (t_raw >= 0) & (t_raw <= 23)
    tc = jnp.clip(t_raw, 0, 23)
    b_fc = _cell(board, fc)
    b_tc = _cell(board, tc)
    own_piece = jnp.where(player < 0, b_fc <= -1, b_fc >= 1)
    dest_open = jnp.where(player < 0, b_tc <= 1, b_tc >= -1)

    # --- normal move (get_normal_moves :600-616)
    legal_normal = (~has_bar) & on_board & in_range & own_piece & dest_open

    # --- bear-off (get_normal_moves :562-597)
    collectible = _is_collectible(board, bar, player)
    exact = jnp.where(player < 0, t_raw == -1, t_raw == 24) & own_piece

    idx = jnp.arange(24)
    # player -1: highest j < die-1 with board[j] < 0 and sum(board[j+1..6]) >= 0
    suff = jnp.cumsum(jnp.where(idx < 6, board, 0)[::-1])[::-1]  # suff[j] = sum board[j:6]
    suff_next = jnp.concatenate([suff[1:6], jnp.zeros(1, suff.dtype)])
    cond_neg = (board[:6] < 0) & (suff_next >= 0)
    j6 = jnp.arange(6)
    hc = jnp.max(jnp.where(cond_neg & (j6 < die - 1), j6, -1))
    # player +1: lowest j >= 24-die with board[j] > 0 and sum(board[18..j]) <= 0
    pre = jnp.cumsum(jnp.where(idx >= 18, board, 0))  # pre[j] = sum board[18:j+1]
    pre_before = jnp.concatenate([jnp.zeros(1, pre.dtype), pre])[:24]  # sum board[18:j]
    j18 = jnp.arange(18, 24)
    cond_pos = (board[18:24] > 0) & (pre_before[18:24] <= 0)
    lc = jnp.min(jnp.where(cond_pos & (j18 >= 24 - die), j18, 99))
    higher = jnp.where(player < 0, fc == hc, fc == lc)

    legal_collect = (
        (~has_bar) & on_board & (~in_range) & collectible & (exact | higher)
    )
    return legal_entry | legal_normal | legal_collect


def legal_digits(board, bar, off, player, die):
    """[26] bool: :func:`legal_single` evaluated for every from-digit at
    once (0..23 board, 24 bar, 25 absent -> always False).

    Same reference semantics (entry :668-681, normal :600-616, bear-off
    :562-597) in elementwise-board form: the per-STATE predicates (bar
    occupancy, collectibility, the bear-off boundary checker hc/lc, the
    entry cell) are computed once instead of once per digit, own-piece and
    destination-open become whole-board compares, and destination lookup
    is a 13x24 static-shift one-hot select (a dynamic gather here would
    hit the TPU cost cliff; per-digit one-hot cell reads — the previous
    form — cost 26 masked 24-wide reductions per state).  Equality with
    legal_single over the full digit axis is pinned by
    tests/test_mask_parity.py.
    """
    del off
    own = (player + 1) // 2
    has_bar = jnp.sum(jnp.where(jnp.arange(2) == own, bar, 0)) > 0

    # --- entry digit (24)
    e = jnp.where(player < 0, 24 - die, die - 1)
    b_e = _cell(board, e)
    legal_entry = has_bar & jnp.where(player < 0, b_e < 2, b_e > -2)

    f = jnp.arange(24)
    own_piece = jnp.where(player < 0, board <= -1, board >= 1)
    open_tab = jnp.where(player < 0, board <= 1, board >= -1)
    t_raw = f + die * player
    in_range = (t_raw >= 0) & (t_raw <= 23)
    # dest_open[f] = open_tab[f + die*player]: 13 static shifts selected by
    # one-hot over k = die*player (out-of-range destinations are False and
    # already excluded by in_range)
    shifted = jnp.stack([
        (f + k >= 0) & (f + k <= 23) & jnp.roll(open_tab, -k)
        for k in range(-6, 7)
    ])  # [13, 24]
    sel = (jnp.arange(-6, 7) == die * player)[:, None]
    dest_open = jnp.any(shifted & sel, axis=0)
    legal_normal = (~has_bar) & in_range & own_piece & dest_open

    # --- bear-off (per-state boundary checkers hc/lc, as in legal_single)
    collectible = _is_collectible(board, bar, player)
    exact = jnp.where(player < 0, t_raw == -1, t_raw == 24) & own_piece
    idx = jnp.arange(24)
    suff = jnp.cumsum(jnp.where(idx < 6, board, 0)[::-1])[::-1]
    suff_next = jnp.concatenate([suff[1:6], jnp.zeros(1, suff.dtype)])
    cond_neg = (board[:6] < 0) & (suff_next >= 0)
    j6 = jnp.arange(6)
    hc = jnp.max(jnp.where(cond_neg & (j6 < die - 1), j6, -1))
    pre = jnp.cumsum(jnp.where(idx >= 18, board, 0))
    pre_before = jnp.concatenate([jnp.zeros(1, pre.dtype), pre])[:24]
    j18 = jnp.arange(18, 24)
    cond_pos = (board[18:24] > 0) & (pre_before[18:24] <= 0)
    lc = jnp.min(jnp.where(cond_pos & (j18 >= 24 - die), j18, 99))
    higher = jnp.where(player < 0, f == hc, f == lc)
    legal_collect = (~has_bar) & (~in_range) & collectible & (exact | higher)

    return jnp.concatenate([
        legal_normal | legal_collect,
        jnp.stack([legal_entry, jnp.zeros((), bool)]),
    ])


# ---------------------------------------------------------------------------
# Legal-action mask (reference get_valid_moves backgammon_logic.rs:403-414)
# ---------------------------------------------------------------------------


def _pack_signature(board, bar, off):
    """Exact packed state signature: 5 int32 keys, each < 2**30.

    Used for the reference's duplicate-resulting-state removal
    (remove_duplicate_states, backgammon_logic.rs:753-774) with exact
    equality (no hashing)."""
    cells = (board + 15).astype(jnp.int32)  # 0..30, 5 bits
    shifts = jnp.array([1, 32, 32 ** 2, 32 ** 3, 32 ** 4, 32 ** 5], jnp.int32)
    k = jnp.sum(cells.reshape(4, 6) * shifts[None, :], axis=1)  # [4], 30 bits each
    k4 = bar[0] + 16 * bar[1] + 256 * off[0] + 4096 * off[1]
    return k[0], k[1], k[2], k[3], k4.astype(jnp.int32)


def _mask_tables(state: BgState) -> dict:
    """Stage 1 of the legal-mask kernel: single-move legality tables.

    Returns the [2(die order), 26(digit)] first-move tables, the 52
    intermediate states after each candidate first move, and the
    [2, 26, 26] second-move table (reference get_entry_moves /
    get_normal_moves evaluated over the fixed digit grid instead of the
    recursive ActionNode tree, backgammon_logic.rs:544-720)."""
    board, bar, off, player = state.board, state.bar, state.off, state.player
    roll = state.roll
    high = jnp.maximum(roll[0], roll[1])
    low = jnp.minimum(roll[0], roll[1])
    # attribution axis: index 0 = high die first (action < 676),
    #                   index 1 = low die first (action >= 676)
    d_first = jnp.stack([high, low])
    d_second = jnp.stack([low, high])

    f_axis = jnp.arange(26)

    # -- first-move tables [2, 26] (legal_digits = legal_single over the
    # whole digit axis with per-state work hoisted; equality pinned in
    # tests/test_mask_parity.py)
    legal1 = jax.vmap(
        lambda d: legal_digits(board, bar, off, player, d)
    )(d_first)
    t1_tab = jax.vmap(lambda d: jax.vmap(lambda f: _to_of(f, d, player))(f_axis))(
        d_first
    )

    # -- intermediate states after the first move [2, 26, ...]
    def mk_s1(f, t, ok):
        fm = jnp.where(f == 24, -1, f)
        return apply_submove(board, bar, off, player, fm, t, ok & (f <= 24))

    s1_board, s1_bar, s1_off = jax.vmap(
        lambda dsel: jax.vmap(
            lambda f: mk_s1(f, t1_tab[dsel, f], legal1[dsel, f])
        )(f_axis)
    )(jnp.arange(2))

    # -- second-move tables [2, 26, 26] and [2, 26]
    legal2 = jax.vmap(
        lambda b2, br2, of2, d: jax.vmap(
            lambda b_, br_, of_: legal_digits(b_, br_, of_, player, d)
        )(b2, br2, of2)
    )(s1_board, s1_bar, s1_off, d_second)
    t2_tab = jax.vmap(lambda d: jax.vmap(lambda f: _to_of(f, d, player))(f_axis))(
        d_second
    )
    any2 = jnp.any(legal2, axis=-1)  # [2, 26]
    return dict(
        legal1=legal1, t1_tab=t1_tab, s1_board=s1_board, s1_bar=s1_bar,
        s1_off=s1_off, legal2=legal2, t2_tab=t2_tab, any2=any2,
        d_first=d_first, d_second=d_second, high=high, low=low,
    )


def _mask_raw(state: BgState, tb: dict):
    """Stage 2: per-action raw legality + exact resulting-state signature.

    Evaluates all 1352 encoded actions against the stage-1 tables: the
    canonical-encoding filter (mirror of encode, backgammon_logic.rs:262-359),
    tree legality under either die attribution, the tree-order priority used
    for duplicate tie-breaks, and the packed signature of the reached state.
    Returns (raw [1352] bool, keys [1352, 5] i32, prio [1352] i32)."""
    roll, player = state.roll, state.player
    legal1, legal2 = tb["legal1"], tb["legal2"]
    t1_tab, t2_tab, any2 = tb["t1_tab"], tb["t2_tab"], tb["any2"]
    s1_board, s1_bar, s1_off = tb["s1_board"], tb["s1_bar"], tb["s1_off"]
    high, low = tb["high"], tb["low"]

    # -- per-action evaluation [1352]; all index tables are host numpy
    # constants (_F1D etc.) so these lower to static gathers
    t1 = t1_tab[_DSEL, _F1D]
    t2 = t2_tab[_DSEL, _F2D]
    f1m = jnp.asarray(_F1M)
    f2m = jnp.asarray(_F2M)
    single = jnp.asarray(_SINGLE)
    actions = jnp.asarray(_ACT)

    # canonical-encoding filter: action must be encode(decode(action))
    # (encode_move is elementwise, so it maps over the action axis directly)
    enc = encode_move(f1m, t1, f2m, t2, single, roll, player)
    canonical = enc == actions

    # tree legality under either die attribution (the tree may only generate
    # a sequence via the non-canonical attribution; both count)
    f2c = np.clip(_F2D, 0, 25)

    def ok_att(d):
        first = legal1[d, _F1D] & (t1_tab[d, _F1D] == t1)
        two = legal2[d, _F1D, f2c] & (t2_tab[d, f2c] == t2)
        return first & jnp.where(single, ~any2[d, _F1D], two)

    ok_high_first = ok_att(0)
    ok_low_first = ok_att(1)
    ok = ok_high_first | ok_low_first

    raw = canonical & ok & jnp.asarray(_F1D != 25) & (actions != NOOP_ACTION)

    # earliest tree position: the tree sorts candidate first moves by die
    # value ascending (sort_unstable on (m, (from, to)) tuples,
    # backgammon_logic.rs:619), so the low-die attribution comes first
    die_eff = jnp.where(ok_low_first, low, high)
    prio = (
        (die_eff << 20)
        | ((jnp.asarray(np.where(_F1D == 24, -1, _F1D) + 1)) << 15)
        | ((t1 + 1) << 10)
        | jnp.where(
            single,
            0,
            (jnp.asarray(np.where(_F2D == 24, -1, _F2D) + 1) << 5) | (t2 + 1),
        )
    ).astype(jnp.int32)

    # -- resulting-state signature per action (exact, 5 int32 keys).
    # The packing is LINEAR in the cell values, so instead of materializing
    # all [2,26,26] two-move result boards, pack the 52 one-move states and
    # add the second sub-move's contribution algebraically.  The only
    # board-value lookup (the second move's destination cell) is built as a
    # small [2,26,26] pair table, never as a dynamic [1352]-wide gather.
    sig1 = jax.vmap(
        lambda b_, br_, of_: jnp.stack(_pack_signature(b_, br_, of_))
    )(
        s1_board.reshape(52, 24), s1_bar.reshape(52, 2), s1_off.reshape(52, 2)
    ).reshape(2, 26, 5)

    # The signature must describe the state the action actually reaches, so
    # the intermediate state is taken under an attribution the action is
    # tree-LEGAL under — not the action's own block.  (An action can be
    # legal only via the other die order; its block-attribution first move
    # is then illegal and masked to a no-op, which would make the signature
    # describe a wrong state and break duplicate removal.  ok_att guarantees
    # the chosen attribution's sub-move destinations equal the decoded
    # ones, so the reached state is identical either way.)
    sig_lo = ok_low_first
    base_keys = jnp.where(
        sig_lo[:, None], sig1[1, _F1D], sig1[0, _F1D]
    )  # [1352, 5] static gathers + select
    own = (player + 1) // 2
    opp = 1 - own
    is_collect2 = (t2 < 0) & (f2m >= 0)
    is_entry2 = f2m < 0
    toc = jnp.clip(t2, 0, 23)
    frmc = jnp.clip(f2m, 0, 23)
    # V[d, f1, f2] = s1_board[d, f1, t2_tab[d, f2] clipped]: pair table via
    # a one-hot contraction over the 24 board cells (small, stays on-chip)
    t2_clip = jnp.clip(t2_tab, 0, 23)  # [2, 26]
    oh_t2 = (t2_clip[:, :, None] == jnp.arange(24)).astype(jnp.int32)  # [2,26,24]
    V = jnp.einsum("dfc,dgc->dfg", s1_board, oh_t2)  # [2, 26(f1), 26(f2)]
    v_to = jnp.where(sig_lo, V[1, _F1D, f2c], V[0, _F1D, f2c])  # [1352]
    hit2 = (~is_collect2) & (v_to == -player)
    change_to = jnp.where(
        ~is_collect2, jnp.where(hit2, player - v_to, player), 0
    )
    change_frm = jnp.where(~is_entry2, -player, 0)
    pow32 = jnp.array([1, 32, 32**2, 32**3, 32**4, 32**5], jnp.int32)
    rows = jnp.arange(4)
    dk_rows = (
        (toc // 6 == rows[:, None]) * change_to[None, :] * pow32[toc % 6][None, :]
        + (frmc // 6 == rows[:, None]) * change_frm[None, :] * pow32[frmc % 6][None, :]
    )  # [4, 1352]
    bar_own_coef = jnp.where(own == 0, 1, 16)
    bar_opp_coef = jnp.where(opp == 0, 1, 16)
    off_own_coef = jnp.where(own == 0, 256, 4096)
    dk4 = (
        -is_entry2.astype(jnp.int32) * bar_own_coef
        + hit2.astype(jnp.int32) * bar_opp_coef
        + is_collect2.astype(jnp.int32) * off_own_coef
    )
    delta = jnp.concatenate([dk_rows, dk4[None, :]], axis=0).T  # [1352, 5]
    keys = base_keys + jnp.where(single[:, None], 0, delta)
    return raw, keys, prio


def _mask_dedup(state: BgState, tb: dict, raw, keys, prio):
    """Stage 3: exact duplicate-resulting-state removal over the raw mask
    (remove_duplicate_states, backgammon_logic.rs:753-774).  Returns the
    final [1352] mask WITHOUT the no-op bit."""
    player = state.player
    d_first, d_second = tb["d_first"], tb["d_second"]

    # -- sort-free exact duplicate removal (remove_duplicate_states,
    # backgammon_logic.rs:753-774).  Two raw actions reach the same state
    # only if they are (i) transpositions of one submove pair, or (ii)
    # members of one chain class {f->m_h->t, f->m_l->t, their
    # transpositions, and — when t is the off tray — the overshooting
    # SINGLE bear-off} where m_h/m_l are the intermediate cells under the
    # two die orders; any other pair of submove multisets has a different
    # delta, hence a different final state.  Signature equality is the
    # final arbiter, so spurious candidates are harmless; the enumeration
    # below only has to be complete.
    #
    # TPU shape: everything happens in the [2(block), 26(f2 digit),
    # 26(f1 digit)] grid the action space reshapes to (action = block*676
    # + f2*26 + f1).  Chain-partner properties are [2, 26, 7] tables
    # extracted by shifted-diagonal masked reductions and then BROADCAST
    # along the grid axis they do not depend on; the transposition partner
    # is an axis swap.  No [1352]-wide gathers at all (a dynamic gather or
    # sort here would be 2 orders of magnitude slower, and even static
    # [1352, 7] gathers materialize 14 full-size property tensors).
    props = jnp.concatenate(
        [keys, prio[:, None], raw[:, None].astype(jnp.int32)], axis=1
    )  # [1352, 7]
    pm = props.reshape(2, 26, 26, 7)  # [block, f2 digit, f1 digit, prop]
    keys_g = pm[..., :5]
    prio_g = pm[..., 5]
    raw_g = pm[..., 6] > 0

    digit_axis = jnp.arange(26)
    # intermediate cell digit reached from digit f with a given die
    # (_to_of semantics: bar digit 24 maps to the entry cell)
    m1 = jnp.stack([_to_of(digit_axis, d_first[b], player) for b in range(2)])
    m2 = jnp.stack([_to_of(digit_axis, d_second[b], player) for b in range(2)])

    def diag_f2(mtab):
        # D[b, f, p] = pm[b, mtab[b, f], f, p]
        mask = mtab[:, None, :] == digit_axis[None, :, None]  # [2, 26(r), 26(f)]
        return jnp.sum(pm * mask[..., None], axis=1)  # [2, 26, 7]

    def diag_f1(mtab):
        # D[b, f, p] = pm[b, f, mtab[b, f], p]
        mask = mtab[:, :, None] == digit_axis[None, None, :]  # [2, 26(f), 26(r)]
        return jnp.sum(pm * mask[..., None], axis=2)  # [2, 26, 7]

    e_fm = diag_f2(m1)                # partner (f1=f, f2=m1[f]) in block b
    e_mf = diag_f1(m2)                # partner (f1=m2[f], f2=f) in block b
    e_single = pm[:, 25, :, :]        # partner (f1=f, no-second-move)

    def beats(pp):
        """pp broadcastable against the [2, 26, 26, 7] grid: partner is
        raw-legal, reaches the same state, and precedes in tree order."""
        same = jnp.all(pp[..., :5] == keys_g, axis=-1)
        return (pp[..., 6] > 0) & same & (pp[..., 5] < prio_g)

    pt = jnp.swapaxes(pm, 1, 2)  # pt[b, r, c] = pm[b, c, r] (digit swap)
    dup_g = jnp.zeros((2, 26, 26), bool)
    for b in range(2):
        # transposition partner in block b (the old props[_T_HI/_T_LO])
        dup_g = dup_g | beats(pt[b][None, :, :, :])
        # chain partners indexed by the source's f1 digit (grid column,
        # the old e_*[b][_F1D]) and f2 digit (grid row, e_*[b][_F2D])
        dup_g = dup_g | beats(e_fm[b][None, None, :, :])
        dup_g = dup_g | beats(e_fm[b][None, :, None, :])
        dup_g = dup_g | beats(e_mf[b][None, None, :, :])
        dup_g = dup_g | beats(e_mf[b][None, :, None, :])
        dup_g = dup_g | beats(e_single[b][None, None, :, :])
        dup_g = dup_g | beats(e_single[b][None, :, None, :])

    return (raw_g & (~dup_g)).reshape(NUM_ACTIONS)


def legal_mask(state: BgState) -> jnp.ndarray:
    """[1352] bool legal-action mask, equal to
    {encode(m) for m in reference get_valid_moves()} plus the no-op action
    when (and only when) no move is legal.

    The no-op bit diverges from the reference, which returns an empty move
    list and relies on all-zero policy probabilities to trigger skip_turn
    (alpha_parallel.rs:183-189); making the no-op explicitly legal yields the
    identical trajectory (skip) while keeping the MCTS tree well-formed.

    Staged as tables -> raw+signatures -> dedup so the bench can attribute
    cost per stage (bench/profile_mask.py).
    """
    tb = _mask_tables(state)
    raw, keys, prio = _mask_raw(state, tb)
    mask = _mask_dedup(state, tb, raw, keys, prio)
    return mask.at[NOOP_ACTION].set(~jnp.any(mask))


# ---------------------------------------------------------------------------
# Step (reference apply_move :176-186 / skip_turn :192-196)
# ---------------------------------------------------------------------------


def step(state: BgState, action) -> BgState:
    """Apply an encoded action (NOOP_ACTION = skip turn) and advance the
    turn/dice state.  Doubles are played as two consecutive plies via the
    ``second`` flag (reference apply_move :176-186, design note
    alpha_no_parallel.rs:40-43)."""
    action = jnp.asarray(action, jnp.int32)
    f1, t1, f2, t2, single, noop, _, _ = decode_action(
        action, state.roll, state.player
    )
    board, bar, off = apply_submove(
        state.board, state.bar, state.off, state.player, f1, t1, ~noop
    )
    board, bar, off = apply_submove(
        board, bar, off, state.player, f2, t2, (~noop) & (~single)
    )

    doubles = state.roll[0] == state.roll[1]
    goes_second = doubles & (~state.second) & (~noop)
    turn_passes = ~goes_second
    fresh = dice_from_stream(state.seed, state.cnt, action)
    return state.replace(
        board=board,
        bar=bar,
        off=off,
        player=jnp.where(turn_passes, -state.player, state.player),
        second=goes_second,
        roll=jnp.where(turn_passes, fresh, state.roll),
        cnt=state.cnt + turn_passes.astype(jnp.int32),
    )


def winner(state: BgState) -> jnp.ndarray:
    """0 = none, else the winning player (check_win_without_player,
    backgammon_logic.rs:527-534)."""
    return jnp.where(
        state.off[0] == 15, -1, jnp.where(state.off[1] == 15, 1, 0)
    ).astype(jnp.int32)


def observe(state: BgState) -> jnp.ndarray:
    """[4, 6, 6] float32, NHWC.  Channel semantics identical to the
    reference's as_tensor (backgammon_logic.rs:198-252): board points,
    player, hit counts (12/12), collected (12/12), roll (12/12),
    second-play flag; the reference lays the same planes out NCHW."""
    flat_idx = jnp.arange(24)
    half = (flat_idx < 12).astype(jnp.int32)

    def plane(v):
        return jnp.asarray(v, jnp.float32).reshape(4, 6)

    ch0 = plane(state.board)
    ch1 = plane(jnp.full(24, state.player))
    ch2 = plane(jnp.where(half, state.bar[0], state.bar[1]))
    ch3 = plane(jnp.where(half, state.off[0], state.off[1]))
    ch4 = plane(jnp.where(half, state.roll[0], state.roll[1]))
    ch5 = plane(jnp.full(24, state.second.astype(jnp.int32)))
    return jnp.stack([ch0, ch1, ch2, ch3, ch4, ch5], axis=-1)


def player_of(state: BgState) -> jnp.ndarray:
    return state.player


ENV = Env(
    spec=SPEC,
    init=init,
    step=step,
    legal_mask=legal_mask,
    observe=observe,
    winner=winner,
    player=player_of,
)


def validate_state(state: BgState) -> jnp.ndarray:
    """Jittable board invariant check (reference is_valid,
    backgammon_logic.rs:433-452): each side accounts for exactly 15 checkers
    across board + bar + off, counts are non-negative and dice in range.
    Returns a bool; use under ``jax.vmap`` as a debug-mode health check
    (the reference asserts this after decode, alpha_parallel.rs:203-209).
    """
    neg = jnp.sum(jnp.where(state.board < 0, -state.board, 0))
    pos = jnp.sum(jnp.where(state.board > 0, state.board, 0))
    ok_m1 = neg + state.bar[0] + state.off[0] == 15
    ok_p1 = pos + state.bar[1] + state.off[1] == 15
    ok_counts = (
        jnp.all(state.bar >= 0)
        & jnp.all(state.off >= 0)
        & jnp.all(jnp.abs(state.board) <= 15)
    )
    ok_roll = jnp.all((state.roll >= 1) & (state.roll <= 6))
    ok_player = jnp.abs(state.player) == 1
    return ok_m1 & ok_p1 & ok_counts & ok_roll & ok_player


# ---------------------------------------------------------------------------
# Host-side helpers (not jitted)
# ---------------------------------------------------------------------------


def pretty_str(state: BgState) -> str:
    """Terminal board rendering in the spirit of to_pretty_str
    (backgammon_logic.rs:110-174)."""
    import numpy as np

    b = np.asarray(state.board)
    bar = np.asarray(state.bar)
    off = np.asarray(state.off)
    rows = []
    top = " ".join(f"{i:>3}" for i in range(12, 24))
    bot = " ".join(f"{i:>3}" for i in range(11, -1, -1))
    cells_top = " ".join(f"{b[i]:>3}" for i in range(12, 24))
    cells_bot = " ".join(f"{b[i]:>3}" for i in range(11, -1, -1))
    rows.append(top)
    rows.append(cells_top)
    rows.append("-" * len(top))
    rows.append(cells_bot)
    rows.append(bot)
    player = "Player 1 (x, -1)" if int(state.player) == -1 else "Player 2 (o, +1)"
    info = (
        f"Current turn: {player}  Roll: {tuple(np.asarray(state.roll))}"
        f"  second_play={bool(state.second)}\n"
        f"P1 bar={bar[0]} off={off[0]} | P2 bar={bar[1]} off={off[1]}"
    )
    return info + "\n" + "\n".join(rows)
