"""Sequential early-stopping gate (opt-in, DIVERGENCES.md).

The reference always plays the fixed 400-game gate (versus.rs:168-169,
alpha_versus.rs:74-77); the sequential variant must (a) agree with the
fixed-N decision on clearly-separated simulated winrates, (b) reduce to
the EXACT fixed-N rule when run to exhaustion, and (c) stop early through
the real gate() plumbing.
"""

import jax
import numpy as np
import pytest

from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import init_params, make_net
from die_e_tpu.train.gating import SequentialGate, _binom_sf_ge
from die_e_tpu.train.learner import net_eval_fn

NET = make_net(ttt.SPEC)


class TestBinomTail:
    def test_exact_values(self):
        # P(Bin(4, 0.5) >= 2) = 11/16
        assert _binom_sf_ge(2, 4, 0.5) == pytest.approx(11 / 16, abs=1e-12)
        assert _binom_sf_ge(0, 10, 0.3) == 1.0
        assert _binom_sf_ge(11, 10, 0.3) == 0.0
        # complements sum to 1
        p = _binom_sf_ge(180, 300, 0.5) + (1 - _binom_sf_ge(180, 300, 0.5))
        assert p == pytest.approx(1.0)

    def test_monotone_in_p(self):
        vals = [_binom_sf_ge(150, 300, p) for p in (0.3, 0.45, 0.5, 0.55, 0.7)]
        assert vals == sorted(vals)


class TestSequentialRule:
    def _fixed_decision(self, outcomes, n, thr):
        return "promote" if outcomes[:n].mean() >= thr - 1e-12 else "keep"

    def test_exhaustion_is_exact_fixed_rule(self):
        """Feeding all N games in one update reproduces the fixed-N
        decision exactly, for every possible win count."""
        n = 40
        for w in range(n + 1):
            seq = SequentialGate(n, 0.55, eps=0.02)
            d = seq.update(w, n)
            assert d == ("promote" if w / n >= 0.55 - 1e-12 else "keep"), w

    def test_forced_stops_are_exact(self):
        # threshold already cleared: promote regardless of remaining games
        seq = SequentialGate(400, 0.55)
        assert seq.update(220, 230) == "promote"
        # unreachable: keep regardless of remaining games
        seq = SequentialGate(400, 0.55)
        assert seq.update(0, 181) == "keep"

    @pytest.mark.parametrize("p_true", [0.30, 0.40, 0.50, 0.60, 0.70])
    def test_matches_fixed_on_simulated_winrates(self, p_true):
        """VERDICT r3 item 4's acceptance: over simulated matches at
        clearly-separated true winrates, the sequential decision agrees
        with what the same fixed-400 match would have decided, while
        stopping far earlier on average."""
        rng = np.random.default_rng(1234 + int(p_true * 100))
        n, block = 400, 100
        agree = 0
        games_played = []
        trials = 300
        for _ in range(trials):
            outcomes = (rng.random(n) < p_true).astype(int)
            fixed = self._fixed_decision(outcomes, n, 0.55)
            seq = SequentialGate(n, 0.55, eps=0.02)
            g = 0
            while seq.decision is None:
                b = min(block, n - g)
                seq.update(int(outcomes[g:g + b].sum()), b)
                g += b
            games_played.append(g)
            agree += int(seq.decision == fixed)
        assert agree / trials >= 0.95, (p_true, agree / trials)
        # the point of the sequential gate: clear cases stop early
        if abs(p_true - 0.55) >= 0.10:
            assert np.mean(games_played) <= 0.45 * n, (
                p_true, np.mean(games_played))

    def test_borderline_runs_long_but_stays_valid(self):
        """At p == threshold the rule may run to exhaustion; the decision
        is then the exact fixed rule, never an exception or a hang."""
        rng = np.random.default_rng(7)
        for _ in range(50):
            outcomes = (rng.random(400) < 0.55).astype(int)
            seq = SequentialGate(400, 0.55, eps=0.02)
            g = 0
            while seq.decision is None:
                seq.update(int(outcomes[g:g + 100].sum()), 100)
                g += 100
                assert g <= 400
            assert seq.decision in ("promote", "keep")


class TestGatePlumbing:
    def _arena_cfg(self, **kw):
        from die_e_tpu.core.config import ArenaConfig

        return ArenaConfig(**kw)

    @pytest.mark.parametrize(
        "winrate,expect_promoted",
        [(0.70, True), (0.50, False)],
    )
    def test_gate_sequential_stops_after_one_block(
        self, tmp_path, monkeypatch, winrate, expect_promoted
    ):
        """Through the real gate(): a clear winrate decides after the
        first 100-game block instead of the full 400."""
        from die_e_tpu.arena.versus import Agent, PlayResult
        from die_e_tpu.core.config import MctsConfig
        from die_e_tpu.train import checkpoint as ckpt
        from die_e_tpu.train import gating

        best_vars = init_params(NET, jax.random.PRNGKey(6))
        ckpt.save_variables(
            best_vars, ckpt.best_model_path("tictactoe", str(tmp_path))
        )

        calls = []

        def fake_play(env, eval_fn, p1, p2, rng, mcts_cfg, temperature,
                      num_games, round_limit, metrics=None, **kw):
            calls.append(num_games)
            wins = int(round(winrate * num_games))
            return PlayResult(
                player1=Agent.MODEL, player2=Agent.MODEL,
                wins_p1=wins, wins_p2=num_games - wins, draws=0,
                n_games=num_games, winrate=winrate, games=[],
            )

        monkeypatch.setattr(gating, "play", fake_play)
        events = []

        class Log:
            def log(self, event, **kw):
                events.append((event, kw))

        promoted = gating.gate(
            ttt.ENV, net_eval_fn(NET),
            init_params(NET, jax.random.PRNGKey(7)),
            jax.random.PRNGKey(0), MctsConfig(iterations=2),
            self._arena_cfg(num_games=400, round_limit=9,
                            gate_sequential=True, gate_block=100),
            temperature=1.25, models_base=str(tmp_path), metrics=Log(),
        )
        assert promoted == expect_promoted
        assert calls == [100]  # stopped after the first block
        gate_kw = [kw for ev, kw in events if ev == "gate"][0]
        assert gate_kw["sequential"] is True
        assert gate_kw["games"] == 100

    def test_gate_sequential_real_arena_smoke(self, tmp_path):
        """No stubs: identical tiny models through the real vectorized
        arena under the sequential gate — must terminate and emit a
        decision (winrate ~0.5 between identical models -> keep)."""
        from die_e_tpu.core.config import MctsConfig
        from die_e_tpu.train import checkpoint as ckpt
        from die_e_tpu.train.gating import gate

        variables = init_params(NET, jax.random.PRNGKey(5))
        ckpt.save_variables(
            variables, ckpt.best_model_path("tictactoe", str(tmp_path))
        )
        promoted = gate(
            ttt.ENV, net_eval_fn(NET), variables, jax.random.PRNGKey(0),
            MctsConfig(iterations=4),
            self._arena_cfg(num_games=16, round_limit=9,
                            gate_sequential=True, gate_block=8),
            temperature=1.25, models_base=str(tmp_path),
        )
        assert promoted in (True, False)


def test_config_keys_roundtrip(tmp_path):
    from die_e_tpu.core.config import load_config

    p = tmp_path / "c.toml"
    p.write_text(
        "arena_gate_sequential = true\narena_gate_block = 50\n"
        "arena_gate_eps = 0.01\n"
    )
    cfg = load_config(str(p))
    assert cfg.arena.gate_sequential is True
    assert cfg.arena.gate_block == 50
    assert cfg.arena.gate_eps == 0.01
