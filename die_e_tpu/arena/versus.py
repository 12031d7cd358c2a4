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
evaluates each agent only on its own games (:195-208); here both agents act
on the full batch every round and the side-to-move mask picks which action
applies — lockstep shapes, no host partitioning (SURVEY.md section 2 row 20).
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
from die_e_tpu.search.simple import simple_search


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


def _mcts_actions(env, states, rng, iterations, c, simulate_round_limit):
    """versus.rs:303-306: mct_search per game vs the game's own player."""
    action, _ = simple_search(
        env, states, rng, iterations=iterations, c=c,
        simulate_round_limit=simulate_round_limit,
    )
    return action


def _agent_actions(env, eval_fn, player: Player, states, rng, mcts_cfg,
                   temperature):
    if player.kind == Agent.RANDOM:
        return _random_actions(env, states, rng)
    if player.kind == Agent.MODEL:
        return _model_actions(
            env, eval_fn, player.variables, states, rng,
            mcts_cfg.iterations, mcts_cfg.c,
            mcts_cfg.dirichlet_alpha, mcts_cfg.dirichlet_epsilon, temperature,
            negamax=getattr(mcts_cfg, "negamax", False),
        )
    if player.kind == Agent.MCTS:
        return _mcts_actions(
            env, states, rng, mcts_cfg.iterations, mcts_cfg.c,
            mcts_cfg.simulate_round_limit,
        )
    raise ValueError(f"cannot compute actions for agent {player.kind}")


@partial(jax.jit, static_argnames=("env",))
def _apply_round(env, states, done, action):
    noop = jnp.full_like(action, env.spec.noop_action)
    action = jnp.where(done, noop, action)
    next_states = jax.vmap(env.step)(states, action)
    states = freeze_where(done, states, next_states)
    done = done | jax.vmap(env.done)(states)
    return states, done


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
) -> PlayResult:
    """Run the arena match; player 1 is side -1 (versus.rs:186)."""
    from die_e_tpu.arena.records import GameRecord

    rng, r_seed = jax.random.split(rng)
    seeds = jax.random.randint(
        r_seed, (num_games,), 0, jnp.iinfo(jnp.int32).max
    ).astype(jnp.uint32)
    states = jax.vmap(env.init)(seeds)
    # half the games open with a skipped turn (versus.rs:172-175)
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
    init_states_host = jax.device_get(states)

    done = jax.vmap(env.done)(states)
    turns_log = []  # (player_sign, action, roll) per round, host side

    for rnd in range(round_limit):
        rng, r1, r2 = jax.random.split(rng, 3)
        player_sign = jax.vmap(env.player)(states)
        a1 = _agent_actions(env, eval_fn, player1, states, r1, mcts_cfg, temperature)
        a2 = _agent_actions(env, eval_fn, player2, states, r2, mcts_cfg, temperature)
        action = jnp.where(player_sign == -1, a1, a2)
        if record:
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
    wins_p1 = int(np.sum(winner == -1))
    wins_p2 = int(np.sum(winner == 1))
    games = []
    if record:
        games = GameRecord.from_arrays(
            env, player1.kind, player2.kind, init_states_host, turns_log, winner
        )
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
