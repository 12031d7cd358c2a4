"""scripts/curve_report.py — learning-curve summarizer for long runs."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from curve_report import summarize  # noqa: E402


def _ev(**kw):
    return kw


class TestSummarize:
    def test_one_iteration(self):
        rows = summarize([
            _ev(event="self_play", learn_iter=0, sp_iter=0, fragments=100,
                sims_per_s=1000.0),
            _ev(event="train_epoch", learn_iter=0, epoch=0, loss=5.0,
                policy_loss=4.0, value_loss=1.0),
            _ev(event="train_epoch", learn_iter=0, epoch=1, loss=4.0,
                policy_loss=3.5, value_loss=0.5),
            _ev(event="model_saved", learn_iter=0),
            _ev(event="gate", winrate=0.6, result="promoted"),
        ])
        assert len(rows) == 1
        r = rows[0]
        assert r["loss_first"] == 5.0 and r["loss"] == 4.0
        assert r["sp_fragments"] == 100
        assert r["gate_result"] == "promoted" and r["gate_winrate"] == 0.6

    def test_restart_dedupes_replayed_self_play(self):
        """A watchdog restart re-runs an iteration's self-play; only the
        last occurrence of each (learn_iter, sp_iter) must count."""
        rows = summarize([
            _ev(event="self_play", learn_iter=1, sp_iter=0, fragments=100,
                sims_per_s=1.0),
            _ev(event="run_start", run_id="x", start_iter=1),
            _ev(event="self_play", learn_iter=1, sp_iter=0, fragments=90,
                sims_per_s=2.0),
            _ev(event="self_play", learn_iter=1, sp_iter=1, fragments=80,
                sims_per_s=3.0),
        ])
        assert rows[0]["sp_fragments"] == 90 + 80
        assert rows[0]["sp_sims_per_s"] == 3.0

    def test_gate_attributed_to_last_saved_iter(self):
        rows = summarize([
            _ev(event="model_saved", learn_iter=2),
            _ev(event="gate", winrate=0.4, result="best_kept"),
            _ev(event="model_saved", learn_iter=3),
            _ev(event="gate", winrate=0.56, result="promoted"),
        ])
        by_iter = {r["learn_iter"]: r for r in rows}
        assert by_iter[2]["gate_result"] == "best_kept"
        assert by_iter[3]["gate_result"] == "promoted"
