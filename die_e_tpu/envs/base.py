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


def compact_take(states: State, done, idx):
    """Re-pack a lockstep batch: gather rows ``idx`` [new_B] from the
    [B, ...] state pytree and done mask.  The device-side half of batch
    compaction — the TPU answer to the reference's removal of finished
    games from the batch (alpha_parallel.rs:226-228): lockstep shapes
    can't shrink dynamically, so hosted drivers instead re-pack live games
    into the next power-of-two batch at chunk boundaries (one compile per
    (B, new_B) pair; see :func:`compaction_plan`)."""
    global _COMPACT_TAKE
    if _COMPACT_TAKE is None:
        import jax
        import jax.numpy as jnp

        _COMPACT_TAKE = jax.jit(
            lambda s, d, i: (
                jax.tree_util.tree_map(lambda a: jnp.take(a, i, axis=0), s),
                jnp.take(d, i, axis=0),
            )
        )
    return _COMPACT_TAKE(states, done, idx)


_COMPACT_TAKE = None


def compaction_plan(done_h, min_batch: int):
    """Host-side half of batch compaction: given the fetched done mask
    [B] (numpy bool), return an int32 index array [new_B] packing live
    games first (padded with finished games, which step frozen and
    contribute nothing) — or None when shrinking isn't worthwhile.
    new_B is the next power of two >= max(live, min_batch), so repeated
    compaction costs at most log2(B/min_batch) extra program compiles."""
    import numpy as np

    b = len(done_h)
    live_idx = np.nonzero(~done_h)[0]
    live = max(int(live_idx.size), 1)
    new_b = max(min_batch, 1 << (live - 1).bit_length())
    if new_b >= b:
        return None
    fill = np.nonzero(done_h)[0][: new_b - live_idx.size]
    return np.concatenate([live_idx, fill]).astype(np.int32)


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
