"""Board-invariant health checks (reference is_valid,
backgammon_logic.rs:433-452, and the decoded-move assert,
alpha_parallel.rs:203-209): stepping with any legal action preserves the
15-checkers-per-side invariant."""

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.envs import backgammon as bg


def test_initial_state_valid():
    s = bg.init(jnp.uint32(0))
    assert bool(bg.validate_state(s))


def test_invalid_states_detected():
    s = bg.init(jnp.uint32(0))
    bad = s.replace(board=s.board.at[0].add(1))
    assert not bool(bg.validate_state(bad))
    bad = s.replace(off=jnp.array([16, 0], jnp.int32))
    assert not bool(bg.validate_state(bad))
    bad = s.replace(roll=jnp.array([0, 3], jnp.int32))
    assert not bool(bg.validate_state(bad))


def test_random_legal_play_preserves_invariant():
    B, T = 64, 60
    states = jax.vmap(bg.init)(jnp.arange(B, dtype=jnp.uint32))
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(states, rng):
        def body(_, carry):
            states, rng, all_ok = carry
            rng, sub = jax.random.split(rng)
            legal = jax.vmap(bg.legal_mask)(states)
            logits = jnp.where(legal, 0.0, -jnp.inf)
            action = jax.random.categorical(sub, logits, -1).astype(jnp.int32)
            states = jax.vmap(bg.step)(states, action)
            all_ok = all_ok & jnp.all(jax.vmap(bg.validate_state)(states))
            return states, rng, all_ok

        return jax.lax.fori_loop(0, T, body, (states, rng, jnp.bool_(True)))

    _, _, all_ok = run(states, rng)
    assert bool(all_ok)
