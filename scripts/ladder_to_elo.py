"""Fold strength-ladder results into the Elo match pool.

The ladder's pure-MCTS rung matches (the expensive chip work) are played
with the exact arena settings the Elo tournament uses, so they double as
Elo matches — this converts runs/bg_full/ladder.jsonl rows into elo_match
records appended to runs/bg_full/elo_matches.jsonl (skipping pairs already
present), after which scripts/elo_tournament.py pools them into the fit.

Usage:
    python scripts/ladder_to_elo.py [--ladder runs/bg_full/ladder.jsonl]
        [--out runs/bg_full/elo_matches.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from die_e_tpu.arena.elo import ladder_rows_to_match_records  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="runs/bg_full/ladder.jsonl")
    ap.add_argument("--out", default="runs/bg_full/elo_matches.jsonl")
    args = ap.parse_args()

    def read_jsonl(p):
        path = Path(p)
        if not path.exists():
            return []
        return [json.loads(l) for l in path.read_text().splitlines()
                if l.strip()]

    skipped: list = []
    new = ladder_rows_to_match_records(
        read_jsonl(args.ladder), read_jsonl(args.out), skipped=skipped)
    with open(args.out, "a") as f:
        for rec in new:
            f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
    for row in skipped:
        print(f"skipped (already recorded): {json.dumps(row)}",
              file=sys.stderr)
    print(f"appended {len(new)} match records to {args.out} "
          f"({len(skipped)} duplicates skipped)", file=sys.stderr)


if __name__ == "__main__":
    main()
