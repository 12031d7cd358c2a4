"""Strength ladder: measure a trained model against fixed opponents.

The BASELINE "Elo vs reference" target has no published reference number
(reference README.md:1-113 publishes none), so strength is established on an
absolute ladder instead (VERDICT round-1 item 1): winrate of the best (or a
given) checkpoint vs

* random          — sanity floor
* pure MCTS       — at 100 / 400 / 1000 rollouts (the reference's `mcts`
                    arena agent, src/versus.rs:303-306 / simple_mcts.rs)

using the reference arena protocol (N games, half openings each side, round
-limit draws, versus.rs:160-268).  The model plays with its self-play search
budget (config `iterations`); the MCTS rung budget varies independently.

Prints one JSON line per rung.  Usage:

    python scripts/strength_ladder.py [--model-path models/backgammon/best]
        [--games 128] [--rungs random,mcts100,mcts400,mcts1000]
        [--round-limit 300] [--out ladder.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402


def wilson95(successes: float, n: int) -> tuple[float, float]:
    """95% Wilson score interval for a success proportion (successes =
    wins_p1 only — draws do NOT count toward the arena winrate,
    versus.rs:130-152 / arena.versus.PlayResult)."""
    if n == 0:
        return 0.0, 1.0
    z = 1.959964
    p = successes / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) + z * z / (4 * n)) / n) ** 0.5 / denom
    return max(0.0, center - half), min(1.0, center + half)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None,
                    help="checkpoint dir (default models/backgammon/best)")
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--rungs", default="random,mcts100,mcts400,mcts1000")
    ap.add_argument("--round-limit", type=int, default=300)
    ap.add_argument("--sims", type=int, default=100,
                    help="model PUCT sims per move")
    ap.add_argument("--rollout-limit", type=int, default=60,
                    help="pure-MCTS playout depth cap (truncated playouts "
                    "score 0, like round-limit draws)")
    ap.add_argument("--search-chunk", type=int, default=20,
                    help="pure-MCTS iterations per device program "
                    "(tunnel program-duration bound)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--negamax", action="store_true")
    ap.add_argument("--out", default=None, help="append JSONL here too")
    args = ap.parse_args()

    from die_e_tpu.arena.versus import Agent, Player, play
    from die_e_tpu.core.config import MctsConfig
    from die_e_tpu.core.mesh import compute_dtype
    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train import checkpoint as ckpt
    from die_e_tpu.train.learner import net_eval_fn

    template = init_params(make_net(bg.SPEC), jax.random.PRNGKey(0))
    path = args.model_path or str(ckpt.best_model_path("backgammon"))
    variables = ckpt.restore_variables(path, template)
    eval_fn = net_eval_fn(make_net(bg.SPEC, dtype=compute_dtype()))
    model = Player(Agent.MODEL, variables)

    mcts_cfg = MctsConfig(
        iterations=args.sims, c=2.0, simulate_round_limit=args.round_limit,
        dirichlet_alpha=0.3, dirichlet_epsilon=0.25, negamax=args.negamax,
    )
    rng = jax.random.PRNGKey(args.seed)
    for rung in args.rungs.split(","):
        rung = rung.strip()
        if rung == "random":
            opponent, mcts_iters = Player(Agent.RANDOM), None
        elif rung.startswith("mcts"):
            opponent, mcts_iters = Player(Agent.MCTS), int(rung[4:])
        else:
            raise SystemExit(f"unknown rung {rung!r}")
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        is_mcts = opponent.kind == Agent.MCTS
        res = play(
            bg.ENV, eval_fn, model, opponent, r, mcts_cfg,
            temperature=0.3,  # near-greedy for strength measurement
            num_games=args.games, round_limit=args.round_limit,
            mcts_iterations=mcts_iters,
            mcts_rollout_limit=args.rollout_limit if is_mcts else None,
            mcts_search_chunk=args.search_chunk if is_mcts else None,
        )
        lo, hi = wilson95(res.wins_p1, args.games)
        line = {
            "metric": "strength_ladder", "model": path, "rung": rung,
            "games": args.games, "wins": res.wins_p1, "losses": res.wins_p2,
            "draws": res.draws, "winrate": res.winrate,
            "wilson95": [round(lo, 4), round(hi, 4)],
            "model_sims": args.sims, "round_limit": args.round_limit,
            "secs": round(time.perf_counter() - t0, 1),
        }
        if is_mcts:
            line["rollout_limit"] = args.rollout_limit
        print(json.dumps(line), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
