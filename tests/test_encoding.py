"""Action-codec roundtrip tests ported from
/root/reference/tests/encoding_test.rs, run against both the Python oracle
and the vectorized JAX codec."""

import jax.numpy as jnp
import numpy as np
import pytest

from die_e_tpu.envs import backgammon as bg
from parity import py_oracle as oracle

# (roll, player, actions) — every case from encoding_test.rs
CASES = [
    # single and zero moves (:8-32)
    ((2, 1), -1, []),
    ((2, 1), -1, [(4, 2)]),
    ((2, 1), -1, [(4, 3)]),
    ((2, 1), -1, [(-1, 22)]),
    ((2, 1), -1, [(-1, 23)]),
    ((2, 1), -1, [(1, -1)]),
    ((2, 1), -1, [(0, -1)]),
    ((6, 3), -1, [(1, -1)]),
    ((6, 3), -1, [(2, -1)]),
    ((2, 1), 1, [(19, 21)]),
    ((2, 1), 1, [(19, 20)]),
    ((2, 1), 1, [(-1, 1)]),
    ((2, 1), 1, [(-1, 0)]),
    ((2, 1), 1, [(22, -1)]),
    ((2, 1), 1, [(23, -1)]),
    ((6, 3), 1, [(22, -1)]),
    ((6, 3), 1, [(21, -1)]),
    # double moves (:36-64)
    ((2, 1), -1, [(23, 21), (5, 4)]),
    ((2, 1), -1, [(-1, 22), (-1, 23)]),
    ((2, 1), -1, [(1, -1), (0, -1)]),
    ((4, 6), -1, [(1, -1), (0, -1)]),
    ((2, 1), -1, [(5, 4), (23, 21)]),
    ((2, 1), -1, [(-1, 23), (-1, 22)]),
    ((2, 1), -1, [(0, -1), (1, -1)]),
    ((4, 6), -1, [(0, -1), (1, -1)]),
    ((2, 1), 1, [(1, 3), (21, 22)]),
    ((2, 1), 1, [(-1, 1), (-1, 0)]),
    ((2, 1), 1, [(22, -1), (23, -1)]),
    ((4, 6), 1, [(22, -1), (23, -1)]),
    ((2, 1), 1, [(4, 5), (21, 23)]),
    ((2, 1), 1, [(-1, 0), (-1, 1)]),
    ((2, 1), 1, [(23, -1), (22, -1)]),
    ((4, 6), 1, [(23, -1), (22, -1)]),
    # exceptional cases (:66-92)
    ((6, 1), -1, [(-1, 18), (18, 17)]),
    ((6, 1), -1, [(-1, 23), (23, 17)]),
    ((6, 5), -1, [(6, 0), (3, -1)]),
    ((6, 5), -1, [(6, 1), (3, -1)]),
    ((6, 1), 1, [(-1, 5), (5, 6)]),
    ((6, 1), 1, [(-1, 0), (0, 6)]),
    ((6, 5), 1, [(17, 23), (20, -1)]),
    ((6, 5), 1, [(17, 22), (20, -1)]),
    ((4, 5), -1, [(0, -1), (0, -1)]),
    ((2, 1), -1, [(0, -1), (0, -1)]),
    ((6, 1), 1, [(21, -1)]),
    ((4, 5), 1, [(0, 4), (0, 5)]),
    ((5, 3), 1, [(22, -1), (18, 21)]),
]

IDS = [f"r{r}_p{p}_{a}" for r, p, a in CASES]


@pytest.mark.parametrize("roll,player,actions", CASES, ids=IDS)
def test_roundtrip_oracle(roll, player, actions):
    enc = oracle.encode(actions, roll)
    dec = oracle.decode(enc, roll, player)
    assert dec == actions


@pytest.mark.parametrize("roll,player,actions", CASES, ids=IDS)
def test_roundtrip_jax(roll, player, actions):
    roll_a = jnp.asarray(roll, jnp.int32)
    player_a = jnp.int32(player)
    if not actions:
        enc = bg.NOOP_ACTION
    else:
        (f1, t1) = actions[0]
        single = len(actions) == 1
        (f2, t2) = actions[1] if not single else (0, 0)
        enc = int(
            bg.encode_move(
                jnp.int32(f1), jnp.int32(t1), jnp.int32(f2), jnp.int32(t2),
                jnp.asarray(single), roll_a, player_a,
            )
        )
    assert enc == oracle.encode(actions, roll)
    f1, t1, f2, t2, single, noop, _, _ = bg.decode_action(enc, roll_a, player_a)
    if not actions:
        assert bool(noop)
    else:
        got = (
            [(int(f1), int(t1))]
            if bool(single)
            else [(int(f1), int(t1)), (int(f2), int(t2))]
        )
        assert got == actions


def test_jax_decode_matches_oracle_exhaustively():
    """decode agreement over the whole action space for several rolls."""
    import jax

    for roll in [(2, 1), (6, 3), (4, 4), (6, 6), (5, 3)]:
        for player in (-1, 1):
            roll_a = jnp.asarray(roll, jnp.int32)
            f1, t1, f2, t2, single, noop, _, _ = jax.vmap(
                lambda a: bg.decode_action(a, roll_a, jnp.int32(player))
            )(jnp.arange(bg.NUM_ACTIONS))
            f1, t1, f2, t2 = map(np.asarray, (f1, t1, f2, t2))
            single, noop = np.asarray(single), np.asarray(noop)
            for a in range(bg.NUM_ACTIONS):
                ref = oracle.decode(a, roll, player)
                if not ref:
                    assert noop[a]
                elif len(ref) == 1:
                    assert single[a]
                    assert (f1[a], t1[a]) == ref[0]
                else:
                    assert not single[a] and not noop[a]
                    assert (f1[a], t1[a]) == ref[0]
                    assert (f2[a], t2[a]) == ref[1]
