"""Vectorized Tic-Tac-Toe environment: the minimal deterministic game kept
as a correctness canary, mirroring the reference implementation
(/root/reference/src/tictactoe/mod.rs:15-117)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from die_e_tpu.envs.base import Env, GameSpec

NUM_ACTIONS = 9
NOOP_ACTION = 9  # one-past-the-board "skip" slot; reference EMPTY_MOVE = 10

SPEC = GameSpec(
    name="tictactoe",
    num_actions=NUM_ACTIONS,
    obs_shape=(3, 3, 3),
    conv_output_size=9,
    n_filters=64,
    n_res_blocks=4,
    is_deterministic=True,
    noop_action=NOOP_ACTION,
    obs_int8=True,  # cell planes are {-1, 0, 1}
)

# rows, columns, diagonals (tictactoe/mod.rs:61-66)
_WIN_LINES = jnp.array(
    [
        [0, 1, 2], [3, 4, 5], [6, 7, 8],
        [0, 3, 6], [1, 4, 7], [2, 5, 8],
        [0, 4, 8], [2, 4, 6],
    ],
    jnp.int32,
)


@struct.dataclass
class TttState:
    board: jnp.ndarray  # [9] i32 in {-1, 0, 1}
    player: jnp.ndarray  # i32 scalar, -1 starts


def init(seed) -> TttState:
    del seed
    return TttState(board=jnp.zeros(9, jnp.int32), player=jnp.int32(-1))


def step(state: TttState, action) -> TttState:
    """apply_move (tictactoe/mod.rs:46-49); the noop slot (9) skips the
    turn (skip_turn, :51-53)."""
    action = jnp.asarray(action, jnp.int32)
    valid = action < 9
    a = jnp.clip(action, 0, 8)
    board = state.board.at[a].set(
        jnp.where(valid, state.player, state.board[a])
    )
    return TttState(board=board, player=-state.player)


def legal_mask(state: TttState) -> jnp.ndarray:
    """get_valid_moves (:37-44) as a [9] mask; all-zero when full/terminal
    is impossible here because a winner freezes the game at the driver
    level, mirroring the reference which never searches terminal states."""
    return state.board == 0


def winner(state: TttState) -> jnp.ndarray:
    """check_winner (:58-79): -1/+1 winner; 0 = draw or ongoing.  Use
    together with `done` which distinguishes draws."""
    vals = state.board[_WIN_LINES]  # [8, 3]
    line_won = (vals[:, 0] != 0) & (vals[:, 0] == vals[:, 1]) & (vals[:, 1] == vals[:, 2])
    w = jnp.sum(jnp.where(line_won, vals[:, 0], 0))
    return jnp.sign(w).astype(jnp.int32)


def is_draw(state: TttState) -> jnp.ndarray:
    return (winner(state) == 0) & jnp.all(state.board != 0)


def done(state: TttState) -> jnp.ndarray:
    return (winner(state) != 0) | jnp.all(state.board != 0)


def observe(state: TttState) -> jnp.ndarray:
    """as_tensor (:81-92): one-hot planes (==-1, ==0, ==1), NHWC [3,3,3]."""
    b = state.board.reshape(3, 3)
    return jnp.stack(
        [(b == -1), (b == 0), (b == 1)], axis=-1
    ).astype(jnp.float32)


def player_of(state: TttState) -> jnp.ndarray:
    return state.player


ENV = Env(
    spec=SPEC,
    init=init,
    step=step,
    legal_mask=legal_mask,
    observe=observe,
    winner=winner,
    player=player_of,
    done=done,
)


def pretty_str(state: TttState) -> str:
    import numpy as np

    b = np.asarray(state.board)
    sym = {0: ".", -1: "x", 1: "o"}
    rows = ["|".join(sym[int(v)] for v in b[i * 3 : i * 3 + 3]) for i in range(3)]
    return "\n".join(rows)
