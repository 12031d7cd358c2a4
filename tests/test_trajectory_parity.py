"""Seeded trajectory parity: JAX env == C++ oracle == Python oracle, exactly
(BASELINE.md: "Seeded trajectory parity vs Rust engine: exact"; the seeded
stream contract is defined by the oracle since the reference's thread_rng is
irreproducible, SURVEY.md section 7 hard part 3)."""

import numpy as np
import pytest

from die_e_tpu.envs import backgammon as bg
from parity import oracle as cpp
from parity import py_oracle as pyo


def _mix(x):
    return pyo._mix32(x)


def pick_action(seed, t, mask):
    """The oracle's deterministic action rule: k-th legal action with k from
    the salted stream (oracle.cpp bg_run_trajectory)."""
    legal = np.nonzero(mask)[0]
    k = _mix(seed ^ _mix(0xACC10000 + t)) % len(legal)
    return int(legal[k])


def test_dice_stream_parity():
    for seed in [0, 1, 42, 123456789, 0xFFFFFFFF]:
        for cnt in [0, 1, 2, 77]:
            for salt in [0, 5, 1351]:
                want = pyo.dice_from_stream(seed, cnt, salt)
                got = cpp.dice(seed, cnt, salt)
                j = tuple(
                    np.asarray(
                        bg.dice_from_stream(
                            np.uint32(seed), np.int32(cnt), np.int32(salt)
                        )
                    ).tolist()
                )
                assert want == got == j


@pytest.mark.parametrize("seed", [7, 99, 2024, 31337])
def test_trajectory_parity_jax_vs_cpp(seed):
    import jax

    traj = cpp.run_trajectory(seed, max_steps=600)
    n = traj["n"]
    assert n > 10

    jit_step = jax.jit(bg.step)
    jit_mask = jax.jit(bg.legal_mask)
    s = bg.init(seed)
    for t in range(n):
        assert np.asarray(s.board).tolist() == traj["boards"][t].tolist(), t
        assert np.asarray(s.bar).tolist() == traj["bars"][t].tolist(), t
        assert np.asarray(s.off).tolist() == traj["offs"][t].tolist(), t
        assert np.asarray(s.roll).tolist() == traj["rolls"][t].tolist(), t
        assert int(s.player) == traj["players"][t], t
        assert int(s.second) == traj["seconds"][t], t
        if traj["actions"][t] < 0:
            assert int(bg.winner(s)) != 0
            break
        mask = np.asarray(jit_mask(s))
        a = pick_action(seed, t, mask)
        assert a == int(traj["actions"][t]), (
            f"step {t}: jax picks {a}, oracle {int(traj['actions'][t])}"
        )
        s = jit_step(s, a)


@pytest.mark.parametrize("seed", [5, 1234])
def test_trajectory_parity_py_vs_cpp(seed):
    traj = cpp.run_trajectory(seed, max_steps=600)
    g = pyo.OracleGame(seed)
    for t in range(traj["n"]):
        assert list(g.board[0]) == traj["boards"][t].tolist(), t
        assert list(g.board[1]) == traj["bars"][t].tolist(), t
        assert list(g.board[2]) == traj["offs"][t].tolist(), t
        assert list(g.roll) == traj["rolls"][t].tolist(), t
        if traj["actions"][t] < 0:
            assert g.winner() != 0
            break
        mask = np.zeros(bg.NUM_ACTIONS, bool)
        for a in g.legal_actions():
            mask[a] = True
        a = pick_action(seed, t, mask)
        assert a == int(traj["actions"][t]), t
        g.step(a)


def test_cpp_mask_matches_py_oracle_fuzz():
    import random

    from tests.test_mask_parity import random_position

    rng = random.Random(777)
    for _ in range(60):
        board, bar, off, roll, player = random_position(rng)
        want = pyo.legal_action_set((list(board), bar, off), roll, player)
        got = set(np.nonzero(cpp.legal_mask(board, bar, off, roll, player))[0])
        assert got == want
