"""PRNG stream utilities.

The reference draws all randomness from ``rand::thread_rng`` (irreproducible;
e.g. dice backgammon_logic.rs:100-104, rollout node.rs:177, Dirichlet
noise.rs:10).  Here every random draw flows from explicit ``jax.random`` keys
folded deterministically, which is what makes fixed-seed trajectory /
visit-count regression tests possible (SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

import jax


def fold_in_all(key, *ints):
    for i in ints:
        key = jax.random.fold_in(key, i)
    return key


def per_game_seeds(seed: int, n: int, salt: int = 0):
    """Deterministic uint32 seeds for n lockstep games (feeds the counter
    based dice stream in envs/backgammon.py, shared with the C++ oracle)."""
    import jax.numpy as jnp

    key = fold_in_all(jax.random.PRNGKey(seed), salt)
    return jax.random.randint(
        key, (n,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    ).astype(jnp.uint32)
