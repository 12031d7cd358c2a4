"""TicTacToe env tests ported from /root/reference/tests/tictactoe_test.rs."""

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.envs import tictactoe as ttt


def state_from(board, player):
    return ttt.TttState(
        board=jnp.asarray(board, jnp.int32), player=jnp.int32(player)
    )


def test_init():
    # tictactoe_test.rs:4-24
    s = ttt.init(0)
    assert list(np.asarray(s.board)) == [0] * 9
    assert int(s.player) == -1
    assert not bool(ttt.done(s))


def test_apply_move():
    # tictactoe_test.rs:30-47
    s = ttt.init(0)
    s = ttt.step(s, 4)
    assert int(s.board[4]) == -1
    assert int(s.player) == 1
    s = ttt.step(s, 0)
    assert int(s.board[0]) == 1
    assert int(s.player) == -1


def test_valid_moves():
    # tictactoe_test.rs:49-78
    s = ttt.init(0)
    assert np.asarray(ttt.legal_mask(s)).sum() == 9
    full = state_from([1, -1, 1, -1, 1, -1, 1, -1, 1], -1)
    assert np.asarray(ttt.legal_mask(full)).sum() == 0
    partial = state_from([1, 0, -1, 0, 1, 0, -1, 0, 0], -1)
    mask = np.asarray(ttt.legal_mask(partial))
    assert set(np.nonzero(mask)[0]) == {1, 3, 5, 7, 8}


def test_check_winner():
    # tictactoe_test.rs:80-113
    s = ttt.init(0)
    assert int(ttt.winner(s)) == 0 and not bool(ttt.done(s))
    # row win for -1
    s = state_from([-1, -1, -1, 1, 1, 0, 0, 0, 0], 1)
    assert int(ttt.winner(s)) == -1 and bool(ttt.done(s))
    # column win for +1
    s = state_from([1, -1, 0, 1, -1, 0, 1, 0, 0], -1)
    assert int(ttt.winner(s)) == 1
    # diagonal win for +1
    s = state_from([1, -1, 0, -1, 1, 0, 0, 0, 1], -1)
    assert int(ttt.winner(s)) == 1
    # draw: full board, no line
    s = state_from([1, -1, 1, 1, -1, -1, -1, 1, 1], -1)
    assert int(ttt.winner(s)) == 0 and bool(ttt.done(s)) and bool(ttt.is_draw(s))


def test_observe():
    # as_tensor one-hot planes (tictactoe/mod.rs:81-92)
    s = state_from([-1, 0, 1, 0, -1, 0, 1, 0, 0], -1)
    obs = np.asarray(ttt.observe(s))
    assert obs.shape == (3, 3, 3)
    b = np.asarray(s.board).reshape(3, 3)
    assert (obs[..., 0] == (b == -1)).all()
    assert (obs[..., 1] == (b == 0)).all()
    assert (obs[..., 2] == (b == 1)).all()


def test_batched_play():
    keys = jnp.arange(8)
    states = jax.vmap(ttt.init)(keys)
    states = jax.jit(jax.vmap(ttt.step))(states, jnp.arange(8) % 9)
    boards = np.asarray(states.board)
    for i in range(8):
        assert boards[i, i % 9] == -1
