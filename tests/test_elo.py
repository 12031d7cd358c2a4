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


class TestBootstrapCI:
    def test_ci_contains_point_and_separates_decisive_gaps(self):
        from die_e_tpu.arena.elo import bootstrap_elo

        true = {"random": 0.0, "weak": 200.0, "strong": 500.0}
        matches = _simulate(true, list(true), games=800, seed=3)
        ratings = compute_elo(matches, anchor="random")
        cis = bootstrap_elo(matches, anchor="random", n_boot=80, seed=1)
        for name, (lo, hi) in cis.items():
            assert lo <= ratings[name] <= hi, (name, lo, ratings[name], hi)
        # a 300-Elo gap at 800 games/pair is decisive: intervals disjoint
        assert cis["strong"][0] > cis["weak"][1]
        # the anchor is pinned
        assert cis["random"] == (0.0, 0.0)

    def test_ci_overlaps_for_statistically_even_players(self):
        """The round-3 model_6/model_12 inversion scenario: two players
        whose head-to-head is ~50/50 at 64 games must show overlapping
        CIs — the inversion is noise, and the intervals say so."""
        from die_e_tpu.arena.elo import bootstrap_elo

        matches = [
            MatchResult("m6", "random", 63, 1),
            MatchResult("m12", "random", 62, 2),
            MatchResult("m6", "m12", 35, 29),  # inverted point estimate
        ]
        ratings = compute_elo(matches, anchor="random")
        cis = bootstrap_elo(matches, anchor="random", n_boot=120, seed=2)
        assert ratings["m6"] > ratings["m12"]  # the misleading inversion
        lo6, hi6 = cis["m6"]
        lo12, hi12 = cis["m12"]
        assert lo6 < hi12 and lo12 < hi6  # ...visibly insignificant


class TestSequentialRung:
    """Early-stopping ladder rung (VERDICT r4 item 3): stop when the 95%
    Wilson CI is decisive vs 0.5, never before min_games, always by
    max_games."""

    def test_one_sided_matchup_stops_at_first_block(self):
        from die_e_tpu.arena.elo import SequentialRung

        seq = SequentialRung(128, min_games=32)
        assert seq.update(30, 32) is True
        assert seq.verdict == "above" and seq.games == 32
        lo, _ = seq.ci
        assert lo > 0.5

    def test_weak_model_stops_below(self):
        from die_e_tpu.arena.elo import SequentialRung

        seq = SequentialRung(128, min_games=32)
        assert seq.update(3, 32) is True
        assert seq.verdict == "below"

    def test_balanced_matchup_runs_to_max_games(self):
        from die_e_tpu.arena.elo import SequentialRung

        seq = SequentialRung(128, min_games=32)
        for _ in range(4):
            done = seq.update(16, 32)
        assert done is True and seq.games == 128
        assert seq.verdict is None  # CI never separated from 0.5
        assert seq.winrate == 0.5

    def test_never_stops_before_min_games(self):
        from die_e_tpu.arena.elo import SequentialRung

        seq = SequentialRung(128, min_games=32)
        assert seq.update(16, 16) is False  # perfect record, too few games
        assert seq.update(16, 16) is True   # 32/32 now decisive
        assert seq.verdict == "above"

    def test_block_zero_equivalent_fixed_run(self):
        from die_e_tpu.arena.elo import SequentialRung, wilson95

        seq = SequentialRung(64, min_games=32)
        seq.update(40, 64)
        assert seq.done and seq.games == 64
        assert seq.ci == wilson95(40, 64)


class TestLadderToElo:
    def test_converts_and_skips_existing_pairs(self):
        from die_e_tpu.arena.elo import ladder_rows_to_match_records

        ladder = [
            {"metric": "strength_ladder",
             "model": "runs/bg_full/models/backgammon/model_34",
             "rung": "mcts400", "games": 128, "wins": 70, "losses": 55,
             "draws": 3, "model_sims": 100, "round_limit": 300},
            {"metric": "strength_ladder",
             "model": "runs/bg_full/models/backgammon/model_34",
             "rung": "random", "games": 128, "wins": 128, "losses": 0,
             "draws": 0, "model_sims": 100, "round_limit": 300},
            {"metric": "something_else"},
            # same pair RE-measured at a different game count: a new match,
            # kept (only exact (pair, games, sims) duplicates are skipped)
            {"metric": "strength_ladder",
             "model": "runs/bg_full/models/backgammon/model_34",
             "rung": "mcts400", "games": 64, "wins": 30, "losses": 34,
             "draws": 0, "model_sims": 100},
            # exact duplicate of the first row: skipped
            {"metric": "strength_ladder",
             "model": "runs/bg_full/models/backgammon/model_34",
             "rung": "mcts400", "games": 128, "wins": 70, "losses": 55,
             "draws": 3, "model_sims": 100, "round_limit": 300},
        ]
        existing = [
            # matching (pair, games, sims) measurement already recorded
            {"metric": "elo_match", "player_a": "model_34",
             "player_b": "random", "wins_a": 127, "wins_b": 1, "draws": 0,
             "games": 128, "model_sims": 100},
            # non-match rows (summary lines) must be tolerated, not KeyError
            {"metric": "elo_summary", "note": "no player keys at all"},
        ]
        skipped: list = []
        recs = ladder_rows_to_match_records(ladder, existing, skipped=skipped)
        assert len(recs) == 2
        r = recs[0]
        assert (r["player_a"], r["player_b"]) == ("model_34", "mcts400")
        assert (r["wins_a"], r["wins_b"], r["draws"]) == (70, 55, 3)
        assert r["from_ladder"] is True
        assert recs[1]["games"] == 64  # the re-measurement survives
        # skipped: the random rung already in existing_records at the same
        # (games, sims), and the exact mcts400 duplicate row
        assert sorted(s["rung"] for s in skipped) == ["mcts400", "random"]
        # converted rows round-trip into the fit's MatchResult schema
        from die_e_tpu.arena.elo import matches_from_records

        m = matches_from_records(recs)[0]
        assert m.games == 128

    def test_name_override_beats_dir_basename(self):
        """`best` is a moving pointer: a ladder row measured while best was
        the iter-11 promotion must enter the fit as that model, not as a
        player shared with every later promotion.  Rows carry an optional
        explicit `name` (scripts/strength_ladder.py --name) that wins over
        the path basename."""
        from die_e_tpu.arena.elo import ladder_rows_to_match_records

        ladder = [
            {"metric": "strength_ladder",
             "model": "runs/bg_full/models/backgammon/best",
             "name": "model_11",
             "rung": "mcts100", "games": 32, "wins": 26, "losses": 6,
             "draws": 0, "model_sims": 100},
            {"metric": "strength_ladder",  # no name: basename fallback
             "model": "runs/bg_full/models/backgammon/best", "name": None,
             "rung": "random", "games": 32, "wins": 32, "losses": 0,
             "draws": 0, "model_sims": 100},
        ]
        recs = ladder_rows_to_match_records(ladder)
        assert recs[0]["player_a"] == "model_11"
        assert recs[1]["player_a"] == "best"

    def test_existing_pair_recorded_at_other_settings_does_not_suppress(self):
        from die_e_tpu.arena.elo import ladder_rows_to_match_records

        ladder = [{"metric": "strength_ladder", "model": "x/model_5",
                   "rung": "mcts100", "games": 128, "wins": 60, "losses": 68,
                   "draws": 0, "model_sims": 100}]
        existing = [{"metric": "elo_match", "player_a": "model_5",
                     "player_b": "mcts100", "wins_a": 10, "wins_b": 22,
                     "draws": 0, "games": 32, "model_sims": 100}]
        recs = ladder_rows_to_match_records(ladder, existing)
        assert len(recs) == 1 and recs[0]["games"] == 128
