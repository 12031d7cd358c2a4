"""Model gating: candidate vs current best.

Rebuilds the reference's play_vs_best_model / play_vs_model
(reference src/alphazero/alpha_versus.rs:16-82): if no best model exists the
candidate is promoted immediately (:19-26); otherwise a full arena match is
played (candidate as player 1 / side -1) and the candidate is promoted at
winrate >= 0.55, the best kept at <= 0.45, and kept on inconclusive results
in between (:74-77 via play_vs_model :59-81).

Opt-in sequential gate (``arena_gate_sequential``, DIVERGENCES.md): the
reference always plays the full 400-game match (versus.rs:168-169) even
when the promote/keep decision is already (near-)certain after a fraction
of the games — a fixed-size sample against a 0.55 threshold is
statistically wasteful.  The sequential variant plays in blocks and stops
when the fixed-N decision is determined (deterministically forced, or
predictively at error <= gate_eps per stop); the effective decision rule —
"would a full num_games match promote?" — is unchanged, only its cost.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from die_e_tpu.arena.versus import Agent, Player, play
from die_e_tpu.train import checkpoint as ckpt


def _binom_sf_ge(k: int, n: int, p: float) -> float:
    """P(Bin(n, p) >= k), exact via log-pmf summation (n <= a few hundred
    here, so this is microseconds; no scipy dependency)."""
    if k <= 0:
        return 1.0
    if k > n:
        return 0.0
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    from math import lgamma, log

    lp, lq = log(p), log(1.0 - p)
    ks = np.arange(k, n + 1, dtype=np.float64)
    logpmf = (
        np.array([lgamma(n + 1) - lgamma(x + 1) - lgamma(n - x + 1)
                  for x in ks])
        + ks * lp + (n - ks) * lq
    )
    m = logpmf.max()
    return float(min(1.0, np.exp(m) * np.exp(logpmf - m).sum()))


class SequentialGate:
    """Early-stopping decision rule for the gate arena.

    The gate's effective decision is binary — promote iff the empirical
    winrate of a fixed ``num_games`` match would be >= ``threshold``
    (inconclusive and best-kept outcomes both keep the best model,
    alpha_versus.rs:74-77).  After each block of games this rule stops when
    either bound is deterministically forced (even losing/winning every
    remaining game cannot change the outcome) or the predictive probability
    of the final decision — remaining games ~ Bin(rem, p_hat) at the
    Laplace-smoothed running winrate — clears ``1 - eps`` / ``eps``.

    Feed with update(wins, games); ``decision`` becomes "promote"/"keep"
    once determined (None while undecided).  Exhausting num_games falls
    back to the exact fixed-N rule, so the sequential gate NEVER changes
    the decision of a match that runs to completion.
    """

    def __init__(self, num_games: int, threshold: float, eps: float = 0.02):
        self.num_games = int(num_games)
        self.need_total = int(np.ceil(threshold * num_games - 1e-9))
        self.eps = float(eps)
        self.wins = 0
        self.games = 0
        self.decision: Optional[str] = None

    def update(self, wins: int, games: int) -> Optional[str]:
        if self.decision is not None:
            return self.decision
        self.wins += int(wins)
        self.games += int(games)
        rem = self.num_games - self.games
        need = self.need_total - self.wins
        if need <= 0:
            self.decision = "promote"  # forced: threshold already cleared
        elif need > rem:
            self.decision = "keep"     # forced: unreachable
        elif rem == 0:
            self.decision = "keep"
        else:
            p_hat = (self.wins + 1) / (self.games + 2)  # Laplace-smoothed
            p_win = _binom_sf_ge(need, rem, p_hat)
            if p_win >= 1.0 - self.eps:
                self.decision = "promote"
            elif p_win <= self.eps:
                self.decision = "keep"
        return self.decision

    @property
    def winrate(self) -> float:
        return self.wins / max(self.games, 1)


def gate(
    env,
    eval_fn,
    candidate_variables,
    rng,
    mcts_cfg,
    arena_cfg,
    temperature: float,
    models_base: str = "./models",
    metrics=None,
) -> bool:
    """Run the gate; promotes (writes the ``best`` checkpoint) and returns
    True iff the candidate became the new best."""
    best_path = ckpt.best_model_path(env.spec.name, models_base)
    if not best_path.exists():
        if metrics is not None:
            metrics.log("gate", result="no_best_promoted")
        ckpt.save_variables(candidate_variables, best_path)
        return True

    best_variables = ckpt.restore_variables(best_path, candidate_variables)
    candidate = Player(Agent.MODEL, candidate_variables)
    best = Player(Agent.MODEL, best_variables)

    sequential = bool(getattr(arena_cfg, "gate_sequential", False))
    if sequential:
        seq = SequentialGate(
            arena_cfg.num_games, arena_cfg.promote_threshold,
            eps=getattr(arena_cfg, "gate_eps", 0.02),
        )
        block = int(getattr(arena_cfg, "gate_block", 100))
        wins_p1 = wins_p2 = draws = games = 0
        while seq.decision is None:
            n = min(block, arena_cfg.num_games - games)
            rng, r_block = jax.random.split(rng)
            res = play(
                env, eval_fn, candidate, best, r_block, mcts_cfg,
                temperature=temperature, num_games=n,
                round_limit=arena_cfg.round_limit, metrics=metrics,
            )
            wins_p1 += res.wins_p1
            wins_p2 += res.wins_p2
            draws += res.draws
            games += n
            seq.update(res.wins_p1, n)  # draws count as candidate losses
        winrate = seq.winrate
        promoted = seq.decision == "promote"
    else:
        result = play(
            env, eval_fn, candidate, best, rng, mcts_cfg,
            temperature=temperature, num_games=arena_cfg.num_games,
            round_limit=arena_cfg.round_limit, metrics=metrics,
        )
        winrate = result.winrate
        wins_p1, wins_p2 = result.wins_p1, result.wins_p2
        draws, games = result.draws, result.n_games
        promoted = winrate >= arena_cfg.promote_threshold
    if metrics is not None:
        metrics.log(
            "gate",
            winrate=winrate,
            wins_p1=wins_p1,
            wins_p2=wins_p2,
            draws=draws,
            games=games,
            sequential=sequential,
            result="promoted" if promoted
            else ("best_kept" if winrate <= arena_cfg.keep_threshold
                  else "inconclusive_kept"),
        )
    if promoted:
        ckpt.save_variables(candidate_variables, best_path)
    return promoted
