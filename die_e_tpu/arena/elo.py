"""Elo ratings from arena match results (Bradley-Terry MLE).

The reference publishes no Elo numbers (reference README.md:1-113), so the
BASELINE "Elo vs reference" row is established on an absolute anchored
ladder instead: checkpoints and fixed opponents (random, pure MCTS at
several rollout budgets) play round-robin arena matches
(:func:`die_e_tpu.arena.versus.play`), and this module fits Elo ratings to
the aggregate results under the standard logistic model

    P(a beats b) = 1 / (1 + 10 ** ((R_b - R_a) / 400))

with draws counted as half a win for each side.  The fit is a maximum-
likelihood gradient ascent with one player pinned to an anchor rating
(conventionally ``random`` at 0), which removes the translation degree of
freedom.  Pure numpy — no device work; the expensive part (playing the
matches) happens in the arena.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Mapping, Optional

import numpy as np

ELO_SCALE = math.log(10.0) / 400.0


@dataclasses.dataclass(frozen=True)
class MatchResult:
    """Aggregate head-to-head record between two named players."""

    player_a: str
    player_b: str
    wins_a: int
    wins_b: int
    draws: int = 0

    @property
    def games(self) -> int:
        return self.wins_a + self.wins_b + self.draws

    @property
    def score_a(self) -> float:
        return self.wins_a + 0.5 * self.draws


def compute_elo(
    matches: Iterable[MatchResult],
    anchor: str | None = None,
    anchor_rating: float = 0.0,
    iters: int = 4000,
    lr: float = 8000.0,
) -> dict[str, float]:
    """Fit Elo ratings to ``matches`` by logistic MLE.

    ``anchor`` (default: the first player seen) is pinned to
    ``anchor_rating``; every other rating is relative to it.  ``lr`` is the
    gradient-ascent step in Elo points per unit of per-game score gradient.
    """
    matches = list(matches)
    if not matches:
        return {}
    names: list[str] = []
    for m in matches:
        for n in (m.player_a, m.player_b):
            if n not in names:
                names.append(n)
    if anchor is None:
        anchor = names[0]
    if anchor not in names:
        raise ValueError(f"anchor {anchor!r} played no matches")
    idx = {n: i for i, n in enumerate(names)}
    k = len(names)

    # aggregate: score[i, j] = total score player i took off player j,
    # n[i, j] = games between them (symmetric).
    score = np.zeros((k, k))
    n_games = np.zeros((k, k))
    for m in matches:
        a, b = idx[m.player_a], idx[m.player_b]
        if a == b:
            raise ValueError(f"self-match for {m.player_a!r}")
        score[a, b] += m.score_a
        score[b, a] += m.games - m.score_a
        n_games[a, b] += m.games
        n_games[b, a] += m.games

    r = np.zeros(k)
    total_games = n_games.sum(axis=1)
    total_games = np.where(total_games == 0, 1.0, total_games)
    for _ in range(iters):
        diff = r[:, None] - r[None, :]
        p = 1.0 / (1.0 + np.exp(-ELO_SCALE * diff))
        grad = ELO_SCALE * (score - n_games * p).sum(axis=1)
        r = r + lr * grad / total_games
        r = r - r[idx[anchor]] + anchor_rating
    return {n: float(r[idx[n]]) for n in names}


def bootstrap_elo(
    matches: Iterable[MatchResult],
    anchor: str | None = None,
    anchor_rating: float = 0.0,
    n_boot: int = 200,
    seed: int = 0,
    ci: float = 0.95,
) -> dict[str, tuple[float, float]]:
    """Percentile confidence intervals on the Bradley-Terry ratings by
    parametric bootstrap: each head-to-head record is resampled
    multinomially at its observed win/loss/draw proportions and the fit is
    repeated (VERDICT r3 weak #3 — point ratings alone presented
    head-to-head noise as signal).  Returns {player: (lo, hi)}; the anchor's
    interval is degenerate at its pinned rating."""
    matches = list(matches)
    if not matches:
        return {}
    rng = np.random.default_rng(seed)
    samples: dict[str, list[float]] = {}
    for _ in range(n_boot):
        resampled = []
        for m in matches:
            g = m.games
            if g == 0:
                continue
            w, loss, d = rng.multinomial(
                g, [m.wins_a / g, m.wins_b / g, m.draws / g]
            )
            resampled.append(MatchResult(m.player_a, m.player_b,
                                         int(w), int(loss), int(d)))
        for name, rating in compute_elo(
            resampled, anchor=anchor, anchor_rating=anchor_rating
        ).items():
            samples.setdefault(name, []).append(rating)
    lo_q, hi_q = (1 - ci) / 2, 1 - (1 - ci) / 2
    return {
        n: (float(np.quantile(v, lo_q)), float(np.quantile(v, hi_q)))
        for n, v in samples.items()
    }


def expected_score(rating_a: float, rating_b: float) -> float:
    """P(a beats b) under the fitted model (draws as half-wins)."""
    return 1.0 / (1.0 + 10.0 ** ((rating_b - rating_a) / 400.0))


def wilson95(successes: float, n: int) -> tuple[float, float]:
    """95% Wilson score interval for a success proportion (successes =
    wins only — draws do NOT count toward the arena winrate,
    reference src/versus.rs:130-152 / arena.versus.PlayResult)."""
    if n == 0:
        return 0.0, 1.0
    z = 1.959964
    p = successes / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) + z * z / (4 * n)) / n) ** 0.5 / denom
    return max(0.0, center - half), min(1.0, center + half)


class SequentialRung:
    """Early-stopping rule for a strength-ladder rung (the reporting
    analog of train/gating.SequentialGate's decision rule, VERDICT r4
    item 3): play the rung in blocks and stop as soon as the 95% Wilson
    CI of the winrate is DECISIVE for reporting — entirely above or
    entirely below ``ref`` (0.5 = "which player is stronger") — after at
    least ``min_games``; otherwise run to ``max_games`` and report the
    full-sample estimate.  A stopped rung's CI is still a valid Wilson
    interval at its stopping n (slightly anti-conservative under optional
    stopping — acceptable for a reporting ladder, NOT for the gate, which
    keeps its exact fixed-N rule).

    This is what makes tunnel-expensive rungs (mcts1000 at ~10 s/move
    blocks) affordable: a one-sided matchup stops after one or two blocks
    instead of the fixed 128 games.

    Feed with update(wins, games); ``done`` flips True once decisive or
    exhausted, ``verdict`` is "above"/"below" ``ref`` or None (ran to
    max_games without the CI separating).
    """

    def __init__(self, max_games: int, min_games: int = 32,
                 ref: float = 0.5):
        self.max_games = int(max_games)
        self.min_games = int(min_games)
        self.ref = float(ref)
        self.wins = 0
        self.games = 0
        self.done = False
        self.verdict: Optional[str] = None

    def update(self, wins: int, games: int) -> bool:
        if self.done:
            return True
        self.wins += int(wins)
        self.games += int(games)
        lo, hi = wilson95(self.wins, self.games)
        if self.games >= self.min_games:
            if lo > self.ref:
                self.done, self.verdict = True, "above"
            elif hi < self.ref:
                self.done, self.verdict = True, "below"
        if self.games >= self.max_games:
            self.done = True
        return self.done

    @property
    def ci(self) -> tuple[float, float]:
        return wilson95(self.wins, self.games)

    @property
    def winrate(self) -> float:
        return self.wins / max(self.games, 1)


def matches_from_records(
    records: Iterable[Mapping],
) -> list[MatchResult]:
    """Build MatchResults from JSONL dicts with keys
    player_a/player_b/wins_a/wins_b/draws (the tournament script's
    output rows)."""
    return [
        MatchResult(
            player_a=rec["player_a"],
            player_b=rec["player_b"],
            wins_a=int(rec["wins_a"]),
            wins_b=int(rec["wins_b"]),
            draws=int(rec.get("draws", 0)),
        )
        for rec in records
    ]


def ladder_rows_to_match_records(
    ladder_rows: Iterable[Mapping],
    existing_records: Iterable[Mapping] = (),
    skipped: Optional[list] = None,
) -> list[dict]:
    """Convert strength-ladder JSONL rows into elo_match records so the
    (expensive) pure-MCTS rung matches feed the Elo fit too.

    Legitimate because scripts/strength_ladder.py and
    scripts/elo_tournament.py play matches with IDENTICAL arena settings
    (same play(), temperature 0.3, same MctsConfig) — a ladder rung IS an
    Elo match, just recorded in a different schema.

    Naming convention (shared by both scripts): a checkpoint player is its
    directory BASENAME — ``.../model_12`` -> ``model_12``, ``.../best`` ->
    ``best``.  Never point the ladder and the tournament at the same
    checkpoint under different names (e.g. a copy of best as model_N), or
    the fit sees two distinct players.

    Rows whose (pair, games, model_sims) triple is already present in
    ``existing_records`` are skipped — the same measurement appended twice
    must not be double-counted — but a RE-measurement of a pair at a
    different game count or sims budget is a new match and is kept.
    Non-match rows in ``existing_records`` (summary lines etc.) are
    ignored.  Skipped duplicates are appended to ``skipped`` if given.
    """
    def key(a, b, games, sims):
        return (frozenset((str(a), str(b))), games, sims)

    done = {
        key(r.get("player_a"), r.get("player_b"),
            int(r.get("games", 0) or 0), r.get("model_sims"))
        for r in existing_records
        if r.get("metric") == "elo_match"
        and r.get("player_a") is not None and r.get("player_b") is not None
    }
    out: list[dict] = []
    for row in ladder_rows:
        if row.get("metric") != "strength_ladder":
            continue
        name = row.get("name") or (
            str(row["model"]).rstrip("/").rsplit("/", 1)[-1])
        k = key(name, row["rung"], int(row["games"]), row.get("model_sims"))
        if k in done:
            if skipped is not None:
                skipped.append(dict(row))
            continue
        done.add(k)
        out.append({
            "metric": "elo_match", "player_a": name,
            "player_b": row["rung"], "wins_a": int(row["wins"]),
            "wins_b": int(row["losses"]), "draws": int(row.get("draws", 0)),
            "games": int(row["games"]), "model_sims": row.get("model_sims"),
            "round_limit": row.get("round_limit"),
            "from_ladder": True,
        })
    return out
