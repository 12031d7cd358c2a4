"""die_e_tpu/arena/elo.py — Bradley-Terry Elo fit."""

import numpy as np

from die_e_tpu.arena.elo import (
    MatchResult,
    compute_elo,
    expected_score,
    matches_from_records,
)


def _simulate(true_elo, names, games=4000, seed=0):
    """Round-robin synthetic matches from known ratings."""
    rng = np.random.default_rng(seed)
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            p = expected_score(true_elo[a], true_elo[b])
            wins_a = int(rng.binomial(games, p))
            out.append(MatchResult(a, b, wins_a, games - wins_a))
    return out


class TestComputeElo:
    def test_recovers_known_ratings(self):
        true = {"random": 0.0, "mid": 200.0, "strong": 450.0}
        names = list(true)
        ratings = compute_elo(_simulate(true, names), anchor="random")
        assert ratings["random"] == 0.0
        for n in names:
            assert abs(ratings[n] - true[n]) < 25.0, (n, ratings)

    def test_ordering_and_anchor(self):
        matches = [
            MatchResult("a", "b", 75, 25),
            MatchResult("b", "c", 75, 25),
            MatchResult("a", "c", 90, 10),
        ]
        r = compute_elo(matches, anchor="a", anchor_rating=1000.0)
        assert r["a"] == 1000.0
        assert r["a"] > r["b"] > r["c"]
        # 75% winrate is ~191 Elo under the logistic model
        assert 120 < r["a"] - r["b"] < 260

    def test_draws_count_half(self):
        all_draws = [MatchResult("a", "b", 0, 0, draws=100)]
        r = compute_elo(all_draws, anchor="a")
        assert abs(r["b"]) < 1.0

    def test_empty(self):
        assert compute_elo([]) == {}

    def test_expected_score_consistency(self):
        true = {"x": 0.0, "y": 120.0}
        ratings = compute_elo(_simulate(true, ["x", "y"]), anchor="x")
        p = expected_score(ratings["y"], ratings["x"])
        assert abs(p - expected_score(120.0, 0.0)) < 0.03

    def test_matches_from_records_roundtrip(self):
        rows = [
            {"player_a": "m1", "player_b": "random", "wins_a": 60,
             "wins_b": 30, "draws": 10, "extra": "ignored"},
        ]
        (m,) = matches_from_records(rows)
        assert m.games == 100 and m.score_a == 65.0
