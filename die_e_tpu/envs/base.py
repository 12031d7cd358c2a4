"""Environment interface for TPU-native vectorized games.

TPU-first replacement for the reference's ``LearnableGame`` trait
(reference src/base.rs:8-51).  Instead of an object with methods mutating a
per-game struct, a game is a bundle of *pure, jittable functions* acting on an
unbatched pytree state; everything batches with ``jax.vmap`` and compiles with
``jax.jit``.  Per-game network hyperparameters (the trait consts
ACTION_SPACE_SIZE / N_INPUT_CHANNELS / CONV_OUTPUT_SIZE / N_FILTERS /
N_RES_BLOCKS, reference src/base.rs:17-24) live on :class:`GameSpec`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

Array = Any  # jax array
State = Any  # pytree of arrays


def freeze_where(done, old_states: State, new_states: State) -> State:
    """Per-game select over batched state pytrees: keep ``old_states`` where
    ``done`` [B], else take ``new_states`` — the standard lockstep-batch
    freeze for finished games (replaces the reference's removal of finished
    games from the batch, alpha_parallel.rs:226-228)."""
    import jax
    import jax.numpy as jnp

    def sel(old, new):
        mask = jnp.reshape(done, done.shape + (1,) * (old.ndim - 1))
        return jnp.where(mask, old, new)

    return jax.tree_util.tree_map(sel, old_states, new_states)


@dataclasses.dataclass(frozen=True)
class GameSpec:
    """Static per-game constants (reference src/base.rs:17-24).

    obs shape is NHWC (TPU-friendly); the reference uses NCHW
    (e.g. backgammon [1,6,4,6], reference backgammon_logic.rs:198-252).
    """

    name: str
    num_actions: int          # ACTION_SPACE_SIZE
    obs_shape: Tuple[int, int, int]  # (H, W, C); C == N_INPUT_CHANNELS
    conv_output_size: int     # CONV_OUTPUT_SIZE (flattened H*W)
    n_filters: int            # N_FILTERS
    n_res_blocks: int         # N_RES_BLOCKS
    is_deterministic: bool    # IS_DETERMINISTIC
    noop_action: int          # encode(EMPTY_MOVE)


@dataclasses.dataclass(frozen=True)
class Env:
    """A game as a bundle of pure functions over an unbatched state pytree.

    All functions are jittable and vmappable.  Mapping to the reference trait
    (src/base.rs:26-50):

    * ``init(seed) -> state``          ~ ``new()`` + initial ``roll_die()``
    * ``step(state, action) -> state`` ~ ``decode`` + ``apply_move`` (or
      ``skip_turn`` for the no-op action)
    * ``legal_mask(state) -> [A]bool`` ~ ``get_valid_moves`` as a fixed-shape
      mask over encoded actions
    * ``observe(state) -> [H,W,C]``    ~ ``as_tensor``
    * ``winner(state) -> i32``         ~ ``check_winner`` (0 = no winner yet)
    * ``done(state) -> bool``          whether the game has a winner
    * ``player(state) -> i32``         ~ ``get_player`` (-1 or +1)
    """

    spec: GameSpec
    init: Callable[[Array], State]
    step: Callable[[State, Array], State]
    legal_mask: Callable[[State], Array]
    observe: Callable[[State], Array]
    winner: Callable[[State], Array]
    player: Callable[[State], Array]
    done: Callable[[State], Array] = None  # defaults to winner != 0

    def __post_init__(self):
        if self.done is None:
            w = self.winner
            object.__setattr__(self, "done", lambda s: w(s) != 0)
