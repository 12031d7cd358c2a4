"""Batched self-play, fully jitted.

Rebuilds the reference's self_play_parallel (reference
src/alphazero/alpha_parallel.rs:101-232): num_self_play_batches games step in
lockstep; every move runs one batched PUCT search, samples from the
temperature-adjusted visit distribution, and records
(state, probs, player) fragments that get their outcome relabeled at game
end (+1/-1 from each fragment's player perspective, alpha_parallel.rs:215-223;
0 for round-limit draws, :172-180).

jit-shape differences from the reference (trajectory-preserving, SURVEY.md
section 7 hard part 4):

* finished games are not removed from the batch (HashMap remove,
  alpha_parallel.rs:226-228); they keep stepping masked with a ``valid``
  flag and contribute no fragments.
* skip-turns are the explicit noop action sampled from the search (the
  reference detects an all-zero prob row and calls skip_turn,
  :183-189); noop plies are excluded from training data exactly as the
  reference's skip branch records nothing.
* the stored probability rows are the *unnormalized* temperature powers
  pi^(1/tau) exactly as the reference stores them
  (prob_tensor.pow_(1/temperature), :164-166).  On-device they are kept
  quantized (uint16 of the normalized visit distribution — visit counts
  from <=1000 sims quantize far coarser than 1/65535, so this is lossless
  in practice) and the temperature power is applied on the host at memory
  extraction: at the reference workload (400-round limit x 1024 games x
  1352 actions) the f32 buffer would be 2.2 GB of HBM and host transfer
  per self-play iteration; uint16 halves it and the valid-row filter cuts
  the host copy further.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from die_e_tpu.envs.base import (
    CompactionTracker,
    compact_take,
    compaction_plan,
    freeze_where,
)
from die_e_tpu.search.alpha import alpha_search, sample_action


PROB_QUANT = 65535.0  # uint16 quantization scale for stored visit probs


@struct.dataclass
class Trajectory:
    """[T, B, ...] self-play record; ``valid`` marks fragments that exist in
    the reference's memory (live game, non-skip move)."""

    obs: jnp.ndarray       # [T, B, H, W, C]
    probs: jnp.ndarray     # [T, B, A] uint16 of normalized visit probs
    player: jnp.ndarray    # [T, B]
    valid: jnp.ndarray     # [T, B] bool
    outcome: jnp.ndarray   # [T, B] relabeled per-fragment outcome
    winner: jnp.ndarray    # [B] final winner (0 = draw/round limit)
    num_moves: jnp.ndarray  # [B]


def _self_play_rounds(
    env, eval_fn, params, states, done, rng,
    iterations, c, dirichlet_alpha, dirichlet_epsilon, temperature,
    rounds, negamax, sparse=False, obs_i8=False,
):
    """Traceable core: play up to ``rounds`` lockstep rounds from
    (states, done), recording fragments; early-exits when every game is
    done.  Returns (obs, probs, player, valid, final_states, final_done)
    with buffers [rounds, B, ...].

    ``sparse`` (hosted drivers): record the visit distribution as the
    root-children (action, visits) pairs straight off the array tree —
    [rounds, B, N] int16 + uint16 with N = iterations+1 — instead of the
    dense [rounds, B, A] uint16 row.  For backgammon (A=1352, 100 sims)
    that is ~6.7x less HBM and host transfer for the SAME information; the
    host reconstructs the identical quantized dense row
    (:func:`_dense_q_from_sparse` — exact, because every intermediate
    value is an integer exactly representable in f32).  Action sampling
    still uses the dense on-device distribution, so trajectories are
    bit-identical either way.

    ``obs_i8``: record observations as int8 (valid only when
    ``env.spec.obs_int8`` — exact small-integer tensorizers); 4x less
    transfer, lossless f32 round-trip on the host.
    """
    b = jax.tree_util.tree_leaves(states)[0].shape[0]
    h, w_, c_ = env.spec.obs_shape
    a = env.spec.num_actions
    obs_buf = jnp.zeros((rounds, b, h, w_, c_),
                        jnp.int8 if obs_i8 else jnp.float32)
    if sparse:
        cap = iterations + 1
        probs_buf = (
            jnp.full((rounds, b, cap), -1, jnp.int16),   # root-child action
            jnp.zeros((rounds, b, cap), jnp.uint16),     # root-child visits
        )
    else:
        probs_buf = jnp.zeros((rounds, b, a), jnp.uint16)
    player_buf = jnp.zeros((rounds, b), jnp.int32)
    valid_buf = jnp.zeros((rounds, b), bool)

    def cond(carry):
        _, done, _, t, *_ = carry
        return (t < rounds) & ~jnp.all(done)

    def body(carry):
        states, done, rng, t, obs_buf, probs_buf, player_buf, valid_buf = carry
        rng, r_search, r_sample = jax.random.split(rng, 3)
        res = alpha_search(
            env, eval_fn, params, states, r_search,
            iterations=iterations, c=c,
            dirichlet_alpha=dirichlet_alpha,
            dirichlet_epsilon=dirichlet_epsilon,
            negamax=negamax,
        )
        if sparse:
            is_rc = res.tree.parent == 0  # root children carry the counts
            qprobs = (
                jnp.where(is_rc, res.tree.action, -1).astype(jnp.int16),
                jnp.where(is_rc, res.tree.visits, 0.0).astype(jnp.uint16),
            )
        else:
            qprobs = jnp.round(
                jnp.clip(res.visit_probs, 0.0, 1.0) * PROB_QUANT
            ).astype(jnp.uint16)
        action = sample_action(r_sample, res.visit_probs, temperature)
        # terminal roots produce all-zero prob rows -> freeze those games
        no_probs = jnp.sum(res.visit_probs, axis=-1) <= 0.0
        action = jnp.where(done | no_probs, env.spec.noop_action, action)

        obs = jax.vmap(env.observe)(states)
        if obs_i8:
            obs = obs.astype(jnp.int8)
        player = jax.vmap(env.player)(states)
        is_noop = action == env.spec.noop_action
        valid = (~done) & (~is_noop)

        obs_buf = jax.lax.dynamic_update_index_in_dim(obs_buf, obs, t, 0)
        probs_buf = jax.tree_util.tree_map(
            lambda buf, q: jax.lax.dynamic_update_index_in_dim(buf, q, t, 0),
            probs_buf, qprobs,
        )
        player_buf = jax.lax.dynamic_update_index_in_dim(player_buf, player, t, 0)
        valid_buf = jax.lax.dynamic_update_index_in_dim(valid_buf, valid, t, 0)

        next_states = jax.vmap(env.step)(states, action)
        states = freeze_where(done, states, next_states)
        new_done = done | jax.vmap(env.done)(states)
        return (states, new_done, rng, t + 1, obs_buf, probs_buf,
                player_buf, valid_buf)

    (final_states, done, rng, _, obs, probs, player, valid) = jax.lax.while_loop(
        cond, body,
        (states, done, rng, jnp.int32(0), obs_buf, probs_buf, player_buf,
         valid_buf),
    )
    # the final rng is returned so a chunked host driver threading it into
    # the next chunk reproduces the one-program trajectory BIT-FOR-BIT
    return obs, probs, player, valid, final_states, done, rng


@partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "iterations", "c",
        "dirichlet_alpha", "dirichlet_epsilon", "temperature", "rounds",
        "negamax", "sparse", "obs_i8",
    ),
)
def self_play_chunk(
    env, eval_fn, params, states, done, rng,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    rounds: int = 32,
    negamax: bool = False,
    sparse: bool = False,
    obs_i8: bool = False,
):
    """One bounded chunk of the self-play loop (used by
    :func:`self_play_hosted`): at most ``rounds`` rounds per device
    program, so no single XLA execution runs for many minutes (the axon
    worker has been observed to die under ~10-minute single programs) and
    the host can fetch/filter fragments incrementally instead of holding
    the full [round_limit, B, A] buffer on device."""
    return _self_play_rounds(
        env, eval_fn, params, states, done, rng,
        iterations, c, dirichlet_alpha, dirichlet_epsilon, temperature,
        rounds, negamax, sparse=sparse, obs_i8=obs_i8,
    )


def _dense_q_from_sparse(act, vis, num_actions: int):
    """Rebuild the dense quantized visit-prob rows [F, A] uint16 from the
    sparse root-children record (act [F, N] int16 with -1 = empty slot,
    vis [F, N] uint16).

    BIT-IDENTICAL to the on-device dense path (round(counts/total *
    65535)): counts and totals are sums of integers (exact in f32 up to
    2^24), the division/multiplication run in f32 exactly as XLA's, and
    np.round and jnp.round share round-half-even.
    """
    import numpy as np

    f, n = act.shape
    if f == 0:
        return np.zeros((0, num_actions), np.uint16)
    mask = act >= 0
    rows = np.nonzero(mask)[0].astype(np.int64)
    flat = rows * num_actions + act[mask].astype(np.int64)
    counts = np.bincount(
        flat, weights=vis[mask].astype(np.float64),
        minlength=f * num_actions,
    ).reshape(f, num_actions).astype(np.float32)
    total = counts.sum(axis=1, dtype=np.float32)
    probs = np.where(
        total[:, None] > 0,
        counts / np.maximum(total, np.float32(1e-9))[:, None],
        np.float32(0.0),
    ).astype(np.float32)
    return np.round(probs * np.float32(PROB_QUANT)).astype(np.uint16)


@partial(jax.jit, static_argnames=("env",))
def _chunk_winner(env, states, done):
    """Winner snapshot [B] (0 while live): fetched per chunk so compaction
    can drop finished games without losing their result."""
    return jnp.where(done, jax.vmap(env.winner)(states), 0)


@partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "iterations", "c",
        "dirichlet_alpha", "dirichlet_epsilon", "temperature", "round_limit",
        "negamax",
    ),
)
def self_play_from_states(
    env,
    eval_fn,
    params,
    states,
    rng,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    round_limit: int = 400,
    negamax: bool = False,
) -> Trajectory:
    """Self-play from caller-provided initial states as ONE fused program
    (the sharded multi-chip path passes states pre-placed over the mesh's
    data axis).

    A ``while_loop`` with preallocated [T, B] trajectory buffers replaces a
    fixed-length scan: the loop exits as soon as every game is finished
    (the reference's ``while !states.is_empty()``, alpha_parallel.rs:129),
    which is a multi-x win when games end well before the round limit.
    """
    done0 = jax.vmap(env.done)(states)
    obs, probs, player, valid, final_states, done, _ = _self_play_rounds(
        env, eval_fn, params, states, done0, rng,
        iterations, c, dirichlet_alpha, dirichlet_epsilon, temperature,
        round_limit, negamax,
    )
    # round-limit games have no winner -> outcome 0 (draw, :172-180);
    # finished games relabel every fragment vs its player (:215-223)
    winner = jnp.where(done, jax.vmap(env.winner)(final_states), 0)
    outcome = (winner[None, :] * player).astype(jnp.float32)
    return Trajectory(
        obs=obs,
        probs=probs,
        player=player,
        valid=valid,
        outcome=outcome,
        winner=winner,
        num_moves=jnp.sum(valid.astype(jnp.int32), axis=0),
    )


@partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "batch_size", "iterations", "c",
        "dirichlet_alpha", "dirichlet_epsilon", "temperature", "round_limit",
        "negamax",
    ),
)
def self_play(
    env,
    eval_fn,
    params,
    rng,
    batch_size: int,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    round_limit: int = 400,
    negamax: bool = False,
) -> Trajectory:
    rng, r_seed = jax.random.split(rng)
    seeds = jax.random.randint(
        r_seed, (batch_size,), 0, jnp.iinfo(jnp.int32).max
    ).astype(jnp.uint32)
    states = jax.vmap(env.init)(seeds)
    return self_play_from_states(
        env, eval_fn, params, states, rng,
        iterations=iterations, c=c,
        dirichlet_alpha=dirichlet_alpha,
        dirichlet_epsilon=dirichlet_epsilon,
        temperature=temperature, round_limit=round_limit,
        negamax=negamax,
    )


def self_play_hosted(
    env,
    eval_fn,
    params,
    rng,
    batch_size: int,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    round_limit: int = 400,
    negamax: bool = False,
    chunk_rounds: int = None,
    progress=None,
    compact: bool = None,
    min_batch: int = None,
    init_seeds=None,
    stats: dict = None,
):
    """Chunked self-play driver: the lockstep loop runs ``chunk_rounds``
    rounds per device program, the host fetches each chunk, filters the
    valid fragments immediately (uint16 probs, per-fragment game index +
    player) and continues from the returned states.

    BIT-IDENTICAL to :func:`self_play` + :func:`trajectory_to_memory` for
    any ``chunk_rounds`` (the loop rng is threaded through the chunks, and
    outcome relabeling against the final winner matches reference
    alpha_parallel.rs:172-223 — tested in tests/test_train.py), but no
    single XLA execution exceeds ``chunk_rounds`` rounds and device/host
    memory is bounded by the chunk, not the round limit — at the reference
    workload (1024 games x 400 rounds) the one-program form holds a 830 MB
    uint16 probs buffer and runs ~8 minutes as one program, which the axon
    single-chip worker does not survive.

    ``compact`` (default: env DIE_E_SP_COMPACT=1) additionally re-packs
    live games into the next power-of-two batch at chunk boundaries
    (>= ``min_batch``, env DIE_E_SP_MIN_BATCH, default 128) — the hosted
    equivalent of the reference REMOVING finished games from its batch
    (alpha_parallel.rs:226-228, DIVERGENCES.md row 12): late-game rounds
    then search a fraction of the original batch instead of a mostly-done
    full batch.  Trajectories are no longer bit-identical to the fused
    form (batch shape feeds the rng draws) but the game/fragment semantics
    are unchanged (tested in tests/test_train.py).

    ``init_seeds`` (optional [batch_size] uint32) provides the game seeds
    explicitly — the multi-process learn loop derives the GLOBAL game set
    deterministically and hands each host its slice, so the set of games
    played is independent of the host count (parallel/multihost.py).  The
    rng split that would have drawn the seeds still happens, keeping the
    loop's rng stream identical either way.

    When ``compact`` is on, the per-program round count ADAPTS to the
    compacted batch: rounds = chunk_rounds * (initial_B / current_B),
    capped at DIE_E_SP_CHUNK_MAX (default 16) — device-program duration
    stays roughly constant while the late-game tail amortizes its
    per-chunk dispatch/fetch overhead over 2-4x more rounds.  With
    ``compact`` off the round count never changes, preserving the
    bit-identical-to-fused contract above.

    ``stats`` (optional dict) receives a wall-time attribution of the
    driver: {"t_dispatch", "t_fetch", "t_extract", "n_chunks",
    "n_row_rounds"} — t_fetch is time BLOCKED on the pending chunk's
    host copy (device+transfer not hidden by the 1-deep pipeline),
    n_row_rounds is the total searched rows across rounds (the true
    device sim volume incl. done-game padding, vs len(obs) valid ones).

    Returns (obs [F,H,W,C] f32, ps [F,A] f32 temperature powers,
    outcome [F] f32, winner [B] i32, num_moves int).
    """
    import os

    import numpy as np

    if chunk_rounds is None:
        # measured on the axon single-chip tunnel: ~16 s single programs
        # survive, ~45 s programs crash the worker — 6 rounds x 100 sims at
        # B=1024 is ~10 s.  Real (untunneled) chips can raise this.
        chunk_rounds = int(os.environ.get("DIE_E_SP_CHUNK", "6"))
    if compact is None:
        compact = os.environ.get("DIE_E_SP_COMPACT", "0") == "1"
    if min_batch is None:
        min_batch = int(os.environ.get("DIE_E_SP_MIN_BATCH", "128"))
    # sparse root-children prob record + int8 obs: ~6x less device->host
    # transfer with bit-identical outputs (see _self_play_rounds); on by
    # default, DIE_E_SP_SPARSE=0 / DIE_E_SP_OBS_I8=0 are the kill switches
    sparse = os.environ.get("DIE_E_SP_SPARSE", "1") == "1"
    obs_i8 = (bool(getattr(env.spec, "obs_int8", False))
              and os.environ.get("DIE_E_SP_OBS_I8", "1") == "1")

    rng, r_seed = jax.random.split(rng)
    if init_seeds is not None:
        seeds = jnp.asarray(init_seeds, jnp.uint32)
        batch_size = seeds.shape[0]
    else:
        seeds = jax.random.randint(
            r_seed, (batch_size,), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.uint32)
    states = jax.vmap(env.init)(seeds)
    done = jax.vmap(env.done)(states)

    frags_obs, frags_q, frags_player, frags_gidx = [], [], [], []
    # per-original-game winner/done accumulators: games dropped by a
    # compaction have already finished, so their winner is recorded from
    # the chunk fetch before they can be dropped
    tracker = CompactionTracker(batch_size)

    def _process(chunk):
        """Fetch + valid-filter one chunk's buffers; returns the fetched
        done mask (all() == match over)."""
        obs, qprobs, player, valid, done, winner, gmap = chunk
        valid_h = np.asarray(valid).reshape(-1)
        player_h = np.asarray(player)
        r, b = player_h.shape
        frags_obs.append(
            np.asarray(obs).reshape(r * b, *obs.shape[2:])[valid_h]
        )
        if sparse:
            act, vis = qprobs
            act_h = np.asarray(act).reshape(r * b, act.shape[-1])[valid_h]
            vis_h = np.asarray(vis).reshape(r * b, vis.shape[-1])[valid_h]
            frags_q.append(
                _dense_q_from_sparse(act_h, vis_h, env.spec.num_actions)
            )
        else:
            frags_q.append(np.asarray(qprobs).reshape(r * b, -1)[valid_h])
        frags_player.append(player_h.reshape(-1)[valid_h])
        frags_gidx.append(np.tile(gmap, r)[valid_h])
        done_h = np.asarray(done)
        if winner is not None:
            tracker.merge(done_h, np.asarray(winner), gmap)
        return done_h

    # 1-deep dispatch pipeline: chunk k+1 is dispatched (chained purely on
    # device handles) BEFORE chunk k's big buffers are fetched, and the
    # fetch is started with copy_to_host_async, so the ~20 MB/chunk host
    # transfer overlaps the next chunk's device execution instead of
    # leaving the chip idle (measured: blocking per-chunk fetches cost
    # ~2.3x on the tunneled chip).
    import time as _time

    chunk_max = int(os.environ.get("DIE_E_SP_CHUNK_MAX", "16"))
    st = {"t_dispatch": 0.0, "t_fetch": 0.0, "t_extract": 0.0,
          "n_chunks": 0, "n_row_rounds": 0}
    cur_b = batch_size
    pending = None
    t = 0
    while t < round_limit:
        rounds = min(chunk_rounds, round_limit - t)
        if compact and cur_b < batch_size:
            # adaptive chunk: keep device-program duration roughly constant
            # as the batch compacts (per-round cost scales ~with B)
            rounds = min(chunk_rounds * (batch_size // cur_b), chunk_max,
                         round_limit - t)
        t0 = _time.perf_counter()
        obs, qprobs, player, valid, states, done, rng = self_play_chunk(
            env, eval_fn, params, states, done, rng,
            iterations=iterations, c=c,
            dirichlet_alpha=dirichlet_alpha,
            dirichlet_epsilon=dirichlet_epsilon,
            temperature=temperature, rounds=rounds, negamax=negamax,
            sparse=sparse, obs_i8=obs_i8,
        )
        winner_dev = _chunk_winner(env, states, done) if compact else None
        for buf in jax.tree_util.tree_leaves(
            (obs, qprobs, player, valid, done, winner_dev)
        ):
            try:
                buf.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-jax arrays
                pass
        st["t_dispatch"] += _time.perf_counter() - t0
        st["n_chunks"] += 1
        st["n_row_rounds"] += rounds * cur_b
        t += rounds
        chunk = (obs, qprobs, player, valid, done, winner_dev, tracker.orig)
        if pending is not None:
            t0 = _time.perf_counter()
            done_h = _process(pending)
            st["t_fetch"] += _time.perf_counter() - t0
            if done_h.all():
                pending = None
                break
            if progress is not None:
                progress(t, -1)
            if compact:
                # the processed chunk's done knowledge is one chunk stale
                # w.r.t. the just-dispatched chunk's states (done only
                # grows, so a stale-live game is a superset of live-now:
                # every live game is kept), and it lives in the processed
                # chunk's mapping — project it through the per-original-
                # game accumulator onto the CURRENT mapping.  The gather
                # chains on the in-flight device handles, no sync.
                idx = compaction_plan(tracker.current_done(), min_batch)
                if idx is not None:
                    states, done = compact_take(states, done, jnp.asarray(idx))
                    tracker.take(idx)
                    cur_b = len(idx)
        pending = chunk
    if pending is not None:
        t0 = _time.perf_counter()
        _process(pending)
        st["t_fetch"] += _time.perf_counter() - t0

    done_fin = np.asarray(done)
    winner_fin = np.asarray(
        jnp.where(done, jax.vmap(env.winner)(states), 0)
    )
    if compact:
        tracker.merge(done_fin, winner_fin)
        winner = tracker.final_winner().astype(winner_fin.dtype)
    else:
        winner = winner_fin
    t0 = _time.perf_counter()
    obs = np.concatenate(frags_obs) if frags_obs else np.zeros(
        (0, *env.spec.obs_shape), np.float32
    )
    if obs.dtype != np.float32:  # int8 wire format -> exact f32 round-trip
        obs = obs.astype(np.float32)
    q = np.concatenate(frags_q) if frags_q else np.zeros(
        (0, env.spec.num_actions), np.uint16
    )
    player = np.concatenate(frags_player) if frags_player else np.zeros(
        (0,), np.int32
    )
    gidx = np.concatenate(frags_gidx) if frags_gidx else np.zeros(
        (0,), np.int64
    )
    # pi^(1/tau) via a 65536-entry LUT over the uint16 quant levels —
    # identical values to the elementwise np.power (same computation per
    # distinct level), ~10x faster on the [F, A] table (t_extract was
    # ~11 s/sp-iter at the reference workload as a full np.power)
    lut = np.power(
        np.arange(65536, dtype=np.float32) / np.float32(PROB_QUANT),
        1.0 / temperature, dtype=np.float32,
    )
    ps = lut[q]
    outcome = (winner[gidx] * player).astype(np.float32)
    st["t_extract"] += _time.perf_counter() - t0
    if stats is not None:
        stats.update({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in st.items()})
    return obs, ps, outcome, winner, int(len(obs))


def trajectory_to_memory(traj: Trajectory, temperature: float = 1.25):
    """Flatten [T, B] fragments into the reference's flat memory vec
    (Vec<MemoryFragment>, alphazero.rs:68-73): numpy arrays
    (states, ps, outcomes) keeping only valid fragments.  The stored
    quantized visit probs are dequantized and raised to 1/temperature here,
    on the valid subset only, reproducing the reference's stored
    pi^(1/tau) rows (alpha_parallel.rs:164-166)."""
    import numpy as np

    valid = np.asarray(traj.valid).reshape(-1)
    obs = np.asarray(traj.obs)
    t, b = obs.shape[:2]
    obs = obs.reshape(t * b, *obs.shape[2:])[valid]
    q = np.asarray(traj.probs).reshape(t * b, -1)[valid]
    # unnormalized temperature rows, as the reference stores them
    ps = np.power(
        q.astype(np.float32) / np.float32(PROB_QUANT), 1.0 / temperature
    )
    outcome = np.asarray(traj.outcome).reshape(-1)[valid]
    return obs, ps, outcome
