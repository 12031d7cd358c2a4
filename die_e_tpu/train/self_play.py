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

from die_e_tpu.envs.base import freeze_where
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
    """Self-play from caller-provided initial states (the sharded multi-chip
    path passes states pre-placed over the mesh's data axis).

    A ``while_loop`` with preallocated [T, B] trajectory buffers replaces a
    fixed-length scan: the loop exits as soon as every game is finished
    (the reference's ``while !states.is_empty()``, alpha_parallel.rs:129),
    which is a multi-x win when games end well before the round limit.
    """
    done0 = jax.vmap(env.done)(states)
    b = jax.tree_util.tree_leaves(states)[0].shape[0]
    h, w_, c_ = env.spec.obs_shape
    a = env.spec.num_actions
    obs_buf = jnp.zeros((round_limit, b, h, w_, c_), jnp.float32)
    probs_buf = jnp.zeros((round_limit, b, a), jnp.uint16)
    player_buf = jnp.zeros((round_limit, b), jnp.int32)
    valid_buf = jnp.zeros((round_limit, b), bool)

    def cond(carry):
        _, done, _, t, *_ = carry
        return (t < round_limit) & ~jnp.all(done)

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
        qprobs = jnp.round(
            jnp.clip(res.visit_probs, 0.0, 1.0) * PROB_QUANT
        ).astype(jnp.uint16)
        action = sample_action(r_sample, res.visit_probs, temperature)
        # terminal roots produce all-zero prob rows -> freeze those games
        no_probs = jnp.sum(res.visit_probs, axis=-1) <= 0.0
        action = jnp.where(done | no_probs, env.spec.noop_action, action)

        obs = jax.vmap(env.observe)(states)
        player = jax.vmap(env.player)(states)
        is_noop = action == env.spec.noop_action
        valid = (~done) & (~is_noop)

        obs_buf = jax.lax.dynamic_update_index_in_dim(obs_buf, obs, t, 0)
        probs_buf = jax.lax.dynamic_update_index_in_dim(probs_buf, qprobs, t, 0)
        player_buf = jax.lax.dynamic_update_index_in_dim(player_buf, player, t, 0)
        valid_buf = jax.lax.dynamic_update_index_in_dim(valid_buf, valid, t, 0)

        next_states = jax.vmap(env.step)(states, action)
        states = freeze_where(done, states, next_states)
        new_done = done | jax.vmap(env.done)(states)
        return (states, new_done, rng, t + 1, obs_buf, probs_buf,
                player_buf, valid_buf)

    (final_states, done, _, _, obs, probs, player, valid) = jax.lax.while_loop(
        cond, body,
        (states, done0, rng, jnp.int32(0), obs_buf, probs_buf, player_buf,
         valid_buf),
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
