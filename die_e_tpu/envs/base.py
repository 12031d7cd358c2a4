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
    new_B is the smallest ladder size >= max(live, min_batch), where the
    ladder is {2^k} U {3*2^k} (..., 64, 96, 128, 192, 256, 384, ...):
    the 3*2^k intermediates roughly halve the average done-row padding of
    a pure power-of-two ladder for ~log2 extra program compiles (each
    (B, new_B) shape compiles once per process)."""
    import numpy as np

    b = len(done_h)
    live_idx = np.nonzero(~done_h)[0]
    live = max(int(live_idx.size), 1, min_batch)
    pow2 = 1 << (live - 1).bit_length()          # smallest 2^k >= live
    new_b = pow2 if live > 3 * pow2 // 4 else 3 * pow2 // 4
    if new_b >= b:
        return None
    fill = np.nonzero(done_h)[0][: new_b - live_idx.size]
    return np.concatenate([live_idx, fill]).astype(np.int32)


class CompactionTracker:
    """Per-ORIGINAL-game done/winner bookkeeping for hosted drivers that
    re-pack live games at chunk boundaries (:func:`compaction_plan` +
    :func:`compact_take`).

    A compacted batch carries only the re-packed games, so a finished
    game's winner must be recorded BEFORE a compaction can drop it.  The
    one protocol shared by the hosted self-play and arena drivers:

    * ``merge(done_h, winner_h, gmap)`` folds a fetched chunk's done mask
      and winners — expressed in that chunk's game mapping ``gmap``
      (defaults to the current mapping ``orig``) — into the accumulators;
    * ``take(idx)`` applies a compaction plan to the mapping (the caller
      applies the same ``idx`` to its device batch via compact_take);
    * ``current_done()`` projects accumulated done onto the current
      mapping (for planning against chunk-stale knowledge: done only
      grows, so every live game is kept);
    * ``final_winner()`` projects the accumulated winners back onto the
      original batch — 0 where never finished (round-limit draws,
      versus.rs:231-234 semantics).
    """

    def __init__(self, num_games: int):
        import numpy as np

        self.orig = np.arange(num_games)
        self._done = np.zeros(num_games, bool)
        self._winner = np.zeros(num_games, np.int32)

    def merge(self, done_h, winner_h, gmap=None) -> None:
        import numpy as np

        gmap = self.orig if gmap is None else gmap
        self._done[gmap] |= done_h
        fin = np.nonzero(done_h)[0]
        self._winner[gmap[fin]] = winner_h[fin]

    def take(self, idx) -> None:
        self.orig = self.orig[idx]

    def current_done(self):
        return self._done[self.orig]

    def final_winner(self):
        import numpy as np

        return np.where(self._done, self._winner, 0).astype(np.int32)


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
    # tensorizer output is exactly representable as int8 (small exact
    # integers) — lets hosted drivers ship observations over the wire as
    # int8 with a lossless f32 round-trip (train/self_play.py)
    obs_int8: bool = False


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
