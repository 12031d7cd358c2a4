"""Vectorized arena ("versus") engine.

Rebuilds the reference's play() (reference src/versus.rs:160-268): N games
between two agents, player 1 always controlling side -1
(versus.rs:186 ``player_p1 = -1``), half the games opening with a skipped
turn so each side opens half (versus.rs:172-175), a round limit after which
live games are draws (versus.rs:231-234), and a PlayResult with the winrate
from player 1's perspective (versus.rs:255-267).

Agents (versus.rs:18-20): Random picks uniformly among legal moves
(:307-316), Mcts runs pure-rollout search per game (:303-306, one rayon
thread per game in the reference — here one lockstep batched search), Model
runs the batched PUCT search + temperature sampling (:276-302).

Vectorization note: the reference partitions live games by side to move and
evaluates each agent only on its own games (:195-208); here lockstep shapes
make per-side partitioning impossible, so ONE action computation per round
serves both sides wherever the agent kinds allow it: for model-vs-model
(the gating path — the per-learn-iteration cost) a single batched PUCT
search runs with per-game parameter selection by side-to-move (the dual
eval below), and for identical non-model agents one computation is shared.
MIXED-kind pairs (model vs mcts/random, the strength-ladder path) still
compute both agents' actions over the full batch and select by
side-to-move — the lockstep-shape price of differing per-agent programs.
The whole match (round loop included) is fused under one jit when no
host-side game recording is requested; the ``record=True`` path keeps a
host loop so it can log per-round turns.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.envs.base import freeze_where
from die_e_tpu.search.alpha import alpha_search, sample_action
from die_e_tpu.search.simple import simple_search, simple_search_hosted


class Agent(str, enum.Enum):
    RANDOM = "random"
    MCTS = "mcts"
    MODEL = "model"
    NONE = "none"


@dataclasses.dataclass
class Player:
    """versus.rs:124-127."""

    kind: Agent
    variables: Any = None  # model params for Agent.MODEL


@dataclasses.dataclass
class PlayResult:
    """versus.rs:130-152; winrate is from player 1's perspective."""

    player1: Agent
    player2: Agent
    wins_p1: int
    wins_p2: int
    draws: int
    n_games: int
    winrate: float
    games: list  # GameRecord list (only when record=True)

    def __str__(self):
        return (
            f"Player 1: {self.player1.value}\nPlayer 2: {self.player2.value}\n"
            f"Wins Player 1: {self.wins_p1}\nWins Player 2: {self.wins_p2}\n"
            f"Draws: {self.draws}\nNumber of Games: {self.n_games}\n"
            f"Winrate: {self.winrate * 100.0}%"
        )


def _random_actions(env, states, rng):
    """versus.rs:307-316: uniform over legal moves (the noop bit is legal
    exactly when the reference would return EMPTY_MOVE)."""
    legal = jax.vmap(env.legal_mask)(states)
    logits = jnp.where(legal, 0.0, -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _model_actions(env, eval_fn, variables, states, rng, iterations, c,
                   dirichlet_alpha, dirichlet_epsilon, temperature,
                   negamax=False):
    """versus.rs:276-302: batched PUCT search + temperature sample; all-zero
    prob rows (terminal roots) return the noop/EMPTY_MOVE."""
    r_search, r_sample = jax.random.split(rng)
    res = alpha_search(
        env, eval_fn, variables, states, r_search,
        iterations=iterations, c=c,
        dirichlet_alpha=dirichlet_alpha, dirichlet_epsilon=dirichlet_epsilon,
        negamax=negamax,
    )
    action = sample_action(r_sample, res.visit_probs, temperature)
    no_probs = jnp.sum(res.visit_probs, axis=-1) <= 0.0
    return jnp.where(no_probs, env.spec.noop_action, action)


def _mcts_actions(env, states, rng, iterations, c, simulate_round_limit,
                  rollout_limit=None, search_chunk=None):
    """versus.rs:303-306: mct_search per game vs the game's own player.
    ``search_chunk`` (host-loop callers only) splits the search across
    bounded device programs; the result is bit-identical either way."""
    if search_chunk is not None:
        action, _ = simple_search_hosted(
            env, states, rng, iterations=iterations, chunk=search_chunk,
            c=c, simulate_round_limit=simulate_round_limit,
            rollout_limit=rollout_limit,
        )
    else:
        action, _ = simple_search(
            env, states, rng, iterations=iterations, c=c,
            simulate_round_limit=simulate_round_limit,
            rollout_limit=rollout_limit,
        )
    return action


_DUAL_EVAL_CACHE: dict = {}


def dual_eval_fn(base_eval_fn):
    """Evaluate the net under TWO parameter sets and select each game's row
    by a per-game flag.  Used so model-vs-model matches (the gating path,
    reference versus.rs:195-208) run ONE batched search per round instead of
    two: the tree walk — the dominant cost — happens once, and only the NN
    eval doubles.  Cached so the wrapper is a stable jit static arg."""
    if base_eval_fn not in _DUAL_EVAL_CACHE:

        def dual(params, obs):
            vars1, vars2, use1 = params  # use1: [B] bool, True -> vars1
            p1, v1 = base_eval_fn(vars1, obs)
            p2, v2 = base_eval_fn(vars2, obs)
            policy = jnp.where(use1[:, None], p1, p2)
            value = jnp.where(use1[:, None], v1, v2)
            return policy, value

        _DUAL_EVAL_CACHE[base_eval_fn] = dual
    return _DUAL_EVAL_CACHE[base_eval_fn]


def _agent_actions(env, eval_fn, kind, variables, states, r, iterations, c,
                   simulate_round_limit, dirichlet_alpha, dirichlet_epsilon,
                   temperature, negamax, mcts_iterations,
                   rollout_limit=None, search_chunk=None):
    """One agent's action over the full batch (versus.rs:276-316)."""
    if kind == Agent.RANDOM:
        return _random_actions(env, states, r)
    if kind == Agent.MODEL:
        return _model_actions(
            env, eval_fn, variables, states, r,
            iterations, c, dirichlet_alpha, dirichlet_epsilon,
            temperature, negamax=negamax,
        )
    if kind == Agent.MCTS:
        return _mcts_actions(env, states, r, mcts_iterations, c,
                             simulate_round_limit,
                             rollout_limit=rollout_limit,
                             search_chunk=search_chunk)
    raise ValueError(f"cannot compute actions for agent {kind}")


def _round_actions(env, eval_fn, kind1, kind2, vars1, vars2, states, rng,
                   iterations, c, simulate_round_limit, dirichlet_alpha,
                   dirichlet_epsilon, temperature, negamax,
                   mcts_iterations=None, rollout_limit=None,
                   search_chunk=None):
    """One round's action per game, chosen by the side-to-move's agent.

    Player 1 is always side -1 (versus.rs:186).  Only the side-to-move's
    action is ever applied, so when both agents are models one dual-param
    search suffices, and when both agents are the same non-model kind one
    computation is shared.  kind1/kind2 are static, so the dispatch is
    resolved at trace time.  ``mcts_iterations`` lets the pure-MCTS agent
    run a different rollout budget than the model's PUCT sims (the
    strength-ladder harness pits model@100 vs mcts@100/400/1000); the
    reference shares one MctsConfig between agents (versus.rs:276-306)."""
    if mcts_iterations is None:
        mcts_iterations = iterations
    player_sign = jax.vmap(env.player)(states)
    use1 = player_sign == -1

    if kind1 == Agent.MODEL and kind2 == Agent.MODEL:
        return _model_actions(
            env, dual_eval_fn(eval_fn), (vars1, vars2, use1), states, rng,
            iterations, c, dirichlet_alpha, dirichlet_epsilon, temperature,
            negamax=negamax,
        )

    def single(kind, variables, r):
        return _agent_actions(
            env, eval_fn, kind, variables, states, r, iterations, c,
            simulate_round_limit, dirichlet_alpha, dirichlet_epsilon,
            temperature, negamax, mcts_iterations,
            rollout_limit=rollout_limit, search_chunk=search_chunk,
        )

    if kind1 == kind2:
        # same non-model agent on both sides: the draw only matters for the
        # side to move, so one computation serves both
        return single(kind1, vars1, rng)
    r1, r2 = jax.random.split(rng)
    a1 = single(kind1, vars1, r1)
    a2 = single(kind2, vars2, r2)
    return jnp.where(use1, a1, a2)


_round_actions_jit = partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "kind1", "kind2", "iterations", "c",
        "simulate_round_limit", "dirichlet_alpha", "dirichlet_epsilon",
        "temperature", "negamax", "mcts_iterations", "rollout_limit",
    ),
)(_round_actions)

_agent_actions_jit = partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "kind", "iterations", "c",
        "simulate_round_limit", "dirichlet_alpha", "dirichlet_epsilon",
        "temperature", "negamax", "mcts_iterations", "rollout_limit",
    ),
)(_agent_actions)


@partial(jax.jit, static_argnames=("env",))
def _apply_round(env, states, done, action):
    noop = jnp.full_like(action, env.spec.noop_action)
    action = jnp.where(done, noop, action)
    next_states = jax.vmap(env.step)(states, action)
    states = freeze_where(done, states, next_states)
    done = done | jax.vmap(env.done)(states)
    return states, done


def _init_match(env, r_seed, num_games: int):
    """Fresh games with half the batch opening on a skipped turn
    (versus.rs:168-181)."""
    seeds = jax.random.randint(
        r_seed, (num_games,), 0, jnp.iinfo(jnp.int32).max
    ).astype(jnp.uint32)
    states = jax.vmap(env.init)(seeds)
    skip_first = jnp.arange(num_games) >= num_games // 2
    noop = jnp.full((num_games,), env.spec.noop_action, jnp.int32)
    skipped = jax.vmap(env.step)(states, noop)
    states = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(skip_first, skip_first.shape + (1,) * (a.ndim - 1)), b, a
        ),
        states,
        skipped,
    )
    return states


@partial(
    jax.jit,
    static_argnames=(
        "env", "eval_fn", "kind1", "kind2", "iterations", "c",
        "simulate_round_limit", "dirichlet_alpha", "dirichlet_epsilon",
        "temperature", "negamax", "mcts_iterations", "rollout_limit",
        "rounds",
    ),
)
def _match_rounds(env, eval_fn, kind1, kind2, vars1, vars2, states, done,
                  rng, iterations, c, simulate_round_limit, dirichlet_alpha,
                  dirichlet_epsilon, temperature, negamax, mcts_iterations,
                  rollout_limit, rounds):
    """Up to ``rounds`` fused arena rounds (early-exit while_loop) from
    (states, done); returns the advanced (states, done, rng, rounds_run).
    The match driver chains these so no single XLA execution runs for many
    minutes (same bounded-program-duration rationale as
    train/self_play.self_play_chunk; the rng is threaded through, so any
    chunking plays the identical match)."""

    def cond(carry):
        _, done, _, t = carry
        return (t < rounds) & ~jnp.all(done)

    def body(carry):
        states, done, rng, t = carry
        rng, r = jax.random.split(rng)
        action = _round_actions(
            env, eval_fn, kind1, kind2, vars1, vars2, states, r,
            iterations, c, simulate_round_limit, dirichlet_alpha,
            dirichlet_epsilon, temperature, negamax,
            mcts_iterations=mcts_iterations, rollout_limit=rollout_limit,
        )
        states, done = _apply_round(env, states, done, action)
        return states, done, rng, t + 1

    return jax.lax.while_loop(cond, body, (states, done, rng, jnp.int32(0)))


def _arena_chunk_rounds() -> int:
    """Rounds per device program.  Measured on the axon single-chip
    tunnel: ~16 s single programs survive, ~45 s programs crash the
    worker; 10 arena rounds x 100 sims at B=400 (dual-model eval) stays
    around 10 s.  Read per call (like DIE_E_ARENA_COMPACT and
    DIE_E_SP_CHUNK) so tests and drivers can override after import."""
    import os

    return int(os.environ.get("DIE_E_ARENA_CHUNK", "10"))


def _play_match(env, eval_fn, kind1, kind2, vars1, vars2, rng,
                iterations, c, simulate_round_limit, dirichlet_alpha,
                dirichlet_epsilon, temperature, negamax, mcts_iterations,
                num_games, round_limit, rollout_limit=None):
    """The whole match — init, chunked fused round loop, winners — used
    whenever no host-side game recording is requested.  Removes the
    per-round Python dispatch of the reference's host loop
    (versus.rs:192-253) while bounding each device program to
    _arena_chunk_rounds() rounds.

    With DIE_E_ARENA_COMPACT=1, live games are re-packed into the next
    power-of-two batch at chunk boundaries (>= DIE_E_ARENA_MIN_BATCH,
    default 64) — the reference's per-side live-game partition
    (versus.rs:195-208) translated to lockstep shapes: late rounds search
    a fraction of the batch instead of a mostly-done full batch."""
    import os

    import numpy as np

    from die_e_tpu.envs.base import CompactionTracker, compact_take, compaction_plan
    from die_e_tpu.train.self_play import _chunk_winner

    compact = os.environ.get("DIE_E_ARENA_COMPACT", "0") == "1"
    min_batch = int(os.environ.get("DIE_E_ARENA_MIN_BATCH", "64"))

    rng, r_seed = jax.random.split(rng)
    states = _init_match(env, r_seed, num_games)
    done = jax.vmap(env.done)(states)
    tracker = CompactionTracker(num_games)

    total = 0
    while total < round_limit:
        done_h = np.asarray(done)
        if compact:
            tracker.merge(done_h, np.asarray(_chunk_winner(env, states, done)))
        if done_h.all():
            break
        if compact:
            idx = compaction_plan(done_h, min_batch)
            if idx is not None:
                states, done = compact_take(states, done, jnp.asarray(idx))
                tracker.take(idx)
        rounds = min(_arena_chunk_rounds(), round_limit - total)
        states, done, rng, ran = _match_rounds(
            env, eval_fn, kind1, kind2, vars1, vars2, states, done, rng,
            iterations, c, simulate_round_limit, dirichlet_alpha,
            dirichlet_epsilon, temperature, negamax, mcts_iterations,
            rollout_limit, rounds,
        )
        total += int(ran)
    # live games at the limit are draws (versus.rs:231-234)
    if compact:
        tracker.merge(np.asarray(done),
                      np.asarray(_chunk_winner(env, states, done)))
        winner = jnp.asarray(tracker.final_winner())
    else:
        winner = jnp.where(done, jax.vmap(env.winner)(states), 0)
    return winner, total


def _match_ckpt_save(path, states, done, rng, total, tracker, meta):
    """Atomically persist a hosted-mcts match's round-loop carry (states,
    done, rng, round count, winner tracker).  Tunnel-wedge insurance: a
    killed match resumes at the last saved round instead of replaying the
    whole match (the axon tunnel wedges under sustained mcts dispatch,
    observed rounds 3 and 5)."""
    import json
    import os

    import numpy as np

    payload = {f"leaf_{i}": np.asarray(x)
               for i, x in enumerate(jax.tree_util.tree_leaves(states))}
    payload.update(
        done=np.asarray(done), rng=np.asarray(rng),
        total=np.asarray(total), orig=tracker.orig, tdone=tracker._done,
        twinner=tracker._winner, meta=np.asarray(json.dumps(meta)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def _match_ckpt_load(path, states, rng, tracker, meta):
    """Restore a match checkpoint written by :func:`_match_ckpt_save`;
    returns (states, done, rng, total) or None when the file is absent or
    was written by a match with different settings (``meta`` mismatch —
    e.g. a stale file from another rung)."""
    import json
    import os

    import numpy as np

    if not path or not os.path.exists(path):
        return None
    z = np.load(path)
    if json.loads(str(z["meta"])) != meta:
        return None
    leaves, treedef = jax.tree_util.tree_flatten(states)
    new = [jnp.asarray(np.asarray(z[f"leaf_{i}"]).astype(x.dtype))
           for i, x in enumerate(leaves)]
    tracker.orig = z["orig"]
    tracker._done = z["tdone"]
    tracker._winner = z["twinner"]
    return (jax.tree_util.tree_unflatten(treedef, new),
            jnp.asarray(z["done"]),
            jnp.asarray(np.asarray(z["rng"]).astype(np.asarray(rng).dtype)),
            int(z["total"]))


def _play_match_mcts_hosted(env, eval_fn, kind1, kind2, vars1, vars2, rng,
                            iterations, c, simulate_round_limit,
                            dirichlet_alpha, dirichlet_epsilon, temperature,
                            negamax, mcts_iterations, num_games, round_limit,
                            rollout_limit, search_chunk,
                            match_ckpt=None, ckpt_every=10):
    """Match driver for pure-MCTS opponents: a host round loop in which each
    MCTS search is itself split across ``search_chunk``-iteration device
    programs (one fused arena round with a 100-iteration rollout search is
    minutes of device time — far over the tunnel's program-duration limit).
    The rng threading mirrors ``_match_rounds`` exactly, so this plays the
    bit-identical match to the fused path (tested in
    tests/test_arena.py); DIE_E_ARENA_COMPACT=1 additionally re-packs
    live games at round boundaries (which reshapes the rng draws — still
    the same match protocol, no longer bit-identical).

    ``match_ckpt`` (a file path) persists the round-loop carry every
    ``ckpt_every`` rounds and resumes from it if present, so a killed
    process replays at most ``ckpt_every`` rounds; the file is removed on
    completion.  The rng is part of the carry, so a resumed match is
    bit-identical to an uninterrupted one (tests/test_arena.py)."""
    import os

    import numpy as np

    from die_e_tpu.envs.base import CompactionTracker, compact_take, compaction_plan
    from die_e_tpu.train.self_play import _chunk_winner

    compact = os.environ.get("DIE_E_ARENA_COMPACT", "0") == "1"
    min_batch = int(os.environ.get("DIE_E_ARENA_MIN_BATCH", "64"))

    if mcts_iterations is None:
        mcts_iterations = iterations
    rng, r_seed = jax.random.split(rng)
    states = _init_match(env, r_seed, num_games)
    done = jax.vmap(env.done)(states)
    tracker = CompactionTracker(num_games)
    meta = {"num_games": int(num_games), "round_limit": int(round_limit),
            "mcts_iterations": int(mcts_iterations),
            "kinds": [getattr(kind1, "name", str(kind1)),
                      getattr(kind2, "name", str(kind2))],
            "compact": compact}

    def merge_and_plan():
        done_h = np.asarray(done)
        if not compact:
            return done_h.all(), None
        tracker.merge(done_h, np.asarray(_chunk_winner(env, states, done)))
        return done_h.all(), compaction_plan(done_h, min_batch)

    def actions_for(kind, variables, r):
        if kind == Agent.MCTS:
            return _agent_actions(
                env, eval_fn, kind, variables, states, r, iterations, c,
                simulate_round_limit, dirichlet_alpha, dirichlet_epsilon,
                temperature, negamax, mcts_iterations,
                rollout_limit=rollout_limit, search_chunk=search_chunk,
            )
        return _agent_actions_jit(
            env, eval_fn, kind, variables, states, r, iterations, c,
            simulate_round_limit, dirichlet_alpha, dirichlet_epsilon,
            temperature, negamax, mcts_iterations,
            rollout_limit=rollout_limit,
        )

    total = 0
    if match_ckpt:
        restored = _match_ckpt_load(match_ckpt, states, rng, tracker, meta)
        if restored is not None:
            states, done, rng, total = restored
    while total < round_limit:
        all_done, idx = merge_and_plan()
        if all_done:
            break
        if idx is not None:
            states, done = compact_take(states, done, jnp.asarray(idx))
            tracker.take(idx)
        rng, r = jax.random.split(rng)
        # mirror _round_actions' rng usage: shared draw for identical
        # kinds, split for mixed pairs
        if kind1 == kind2:
            action = actions_for(kind1, vars1, r)
        else:
            r1, r2 = jax.random.split(r)
            use1 = jax.vmap(env.player)(states) == -1
            a1 = actions_for(kind1, vars1, r1)
            a2 = actions_for(kind2, vars2, r2)
            action = jnp.where(use1, a1, a2)
        states, done = _apply_round(env, states, done, action)
        total += 1
        if match_ckpt and total % ckpt_every == 0:
            _match_ckpt_save(match_ckpt, states, done, rng, total,
                             tracker, meta)
    if compact:
        merge_and_plan()
        winner = jnp.asarray(tracker.final_winner())
    else:
        winner = jnp.where(done, jax.vmap(env.winner)(states), 0)
    if match_ckpt and os.path.exists(match_ckpt):
        os.remove(match_ckpt)
    return winner, total


def play(
    env,
    eval_fn,
    player1: Player,
    player2: Player,
    rng,
    mcts_cfg,
    temperature: float = 1.25,
    num_games: int = 400,
    round_limit: int = 400,
    record: bool = False,
    metrics=None,
    mcts_iterations: Optional[int] = None,
    mcts_rollout_limit: Optional[int] = None,
    mcts_search_chunk: Optional[int] = None,
    mcts_match_ckpt: Optional[str] = None,
) -> PlayResult:
    """Run the arena match; player 1 is side -1 (versus.rs:186).

    ``mcts_iterations`` overrides the rollout budget of pure-MCTS agents
    only (default: the shared ``mcts_cfg.iterations``);
    ``mcts_rollout_limit`` caps their playout depth below the draw limit;
    ``mcts_search_chunk`` runs each pure-MCTS search as a chain of
    bounded device programs (host round loop) — same match, smaller
    XLA executions; ``mcts_match_ckpt`` (hosted path only) persists the
    round loop to that file so a killed match resumes instead of
    replaying."""
    from die_e_tpu.arena.records import GameRecord

    negamax = getattr(mcts_cfg, "negamax", False)
    search_args = (
        mcts_cfg.iterations, mcts_cfg.c, mcts_cfg.simulate_round_limit,
        mcts_cfg.dirichlet_alpha, mcts_cfg.dirichlet_epsilon, temperature,
        negamax, mcts_iterations,
    )
    has_mcts = Agent.MCTS in (player1.kind, player2.kind)

    games = []
    if not record and has_mcts and mcts_search_chunk is not None:
        winner, rounds = _play_match_mcts_hosted(
            env, eval_fn, player1.kind, player2.kind,
            player1.variables, player2.variables, rng,
            *search_args, num_games, round_limit,
            mcts_rollout_limit, mcts_search_chunk,
            match_ckpt=mcts_match_ckpt,
        )
        winner = np.asarray(winner)
        if metrics is not None:
            metrics.log("arena_match", rounds=int(rounds),
                        games=num_games)
    elif not record:
        # fused path: the whole match is one jitted program
        winner, rounds = _play_match(
            env, eval_fn, player1.kind, player2.kind,
            player1.variables, player2.variables, rng,
            *search_args, num_games, round_limit,
            rollout_limit=mcts_rollout_limit,
        )
        winner = np.asarray(winner)
        if metrics is not None:
            metrics.log("arena_match", rounds=int(rounds),
                        games=num_games)
    else:
        # host loop: per-round turn logging for game records
        rng, r_seed = jax.random.split(rng)
        states = _init_match(env, r_seed, num_games)
        init_states_host = jax.device_get(states)
        done = jax.vmap(env.done)(states)
        turns_log = []  # (player_sign, action, roll) per round, host side

        for rnd in range(round_limit):
            rng, r = jax.random.split(rng)
            player_sign = jax.vmap(env.player)(states)
            action = _round_actions_jit(
                env, eval_fn, player1.kind, player2.kind,
                player1.variables, player2.variables, states, r,
                *search_args,
                # same match semantics as the unrecorded paths: without
                # these a recorded MCTS opponent silently played
                # full-depth, unchunked rollouts
                rollout_limit=mcts_rollout_limit,
                search_chunk=mcts_search_chunk,
            )
            roll = (
                np.asarray(states.roll) if hasattr(states, "roll") else None
            )
            turns_log.append(
                (
                    np.asarray(player_sign),
                    np.asarray(jnp.where(done, -1, action)),
                    roll,
                )
            )
            states, done = _apply_round(env, states, done, action)
            if bool(jnp.all(done)):
                break
            if metrics is not None and rnd % 50 == 0:
                metrics.log("arena_round", round=rnd,
                            live=int(jnp.sum(~done)))

        winner = np.asarray(
            jnp.where(done, jax.vmap(env.winner)(states), 0)
        )  # live games at the limit are draws (versus.rs:231-234)
        games = GameRecord.from_arrays(
            env, player1.kind, player2.kind, init_states_host, turns_log,
            winner,
        )

    wins_p1 = int(np.sum(winner == -1))
    wins_p2 = int(np.sum(winner == 1))
    return PlayResult(
        player1=player1.kind,
        player2=player2.kind,
        wins_p1=wins_p1,
        wins_p2=wins_p2,
        draws=num_games - wins_p1 - wins_p2,
        n_games=num_games,
        winrate=wins_p1 / num_games,
        games=games,
    )
