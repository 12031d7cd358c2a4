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

Rungs play in blocks with sequential early stopping (arena.elo
SequentialRung): a rung stops once its 95% Wilson CI is decisively above
or below 0.5, which is what makes the expensive mcts400/mcts1000 rungs
affordable on the tunnel (a one-sided matchup stops after 1-2 blocks
instead of fixed --games).  --block 0 restores the fixed-N behavior.

Prints one JSON line per rung.  Usage:

    python scripts/strength_ladder.py [--model-path models/backgammon/best]
        [--games 128] [--rungs random,mcts100,mcts400,mcts1000]
        [--round-limit 300] [--block 32] [--out ladder.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    # the axon sitecustomize PJRT plugin OVERRIDES JAX_PLATFORMS=cpu
    # (CLAUDE.md): forcing CPU requires config.update after importing jax.
    # Without this a "CPU" smoke run lands on the real chip and contends
    # with the training run (observed 2026-08-20: wedged the tunnel).
    jax.config.update("jax_platforms", "cpu")

from die_e_tpu.arena.elo import SequentialRung, wilson95  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None,
                    help="checkpoint dir (default models/backgammon/best)")
    ap.add_argument("--name", default=None,
                    help="player name recorded in the output rows "
                    "(default: the checkpoint dir basename). `best` is a "
                    "MOVING pointer — when laddering it, pass the "
                    "underlying model_N name so the Elo pool never "
                    "conflates two different promotions")
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
    ap.add_argument("--block", type=int, default=32,
                    help="games per sequential block (0 = fixed --games, "
                    "no early stopping)")
    ap.add_argument("--min-games", type=int, default=32,
                    help="games before the sequential rule may stop")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse; listed "
                    "here so argparse accepts it)")
    ap.add_argument("--negamax", action="store_true")
    ap.add_argument("--out", default=None, help="append JSONL here too")
    ap.add_argument("--resume-state", default=None,
                    help="JSON file persisting per-rung block tallies; a "
                    "tunnel crash mid-rung loses at most one block — "
                    "relaunch with the same flags and completed blocks/"
                    "rungs are skipped (block RNG is derived as "
                    "fold_in(seed, rung)/fold_in(., block) so replayed "
                    "schedules are identical)")
    ap.add_argument("--match-ckpt", default=None,
                    help="file prefix for intra-match round checkpoints "
                    "(mcts rungs only): the hosted match persists its "
                    "round loop every ~10 rounds, so a tunnel wedge "
                    "loses minutes instead of the whole block")
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
    base_key = jax.random.PRNGKey(args.seed)
    state_path = Path(args.resume_state) if args.resume_state else None
    state: dict = {}
    if state_path and state_path.exists():
        state = json.loads(state_path.read_text())

    def save_state():
        if state_path:
            tmp = state_path.with_suffix(".tmp")
            tmp.write_text(json.dumps(state))
            tmp.replace(state_path)

    for rung_i, rung in enumerate(args.rungs.split(",")):
        rung = rung.strip()
        if rung == "random":
            opponent, mcts_iters = Player(Agent.RANDOM), None
        elif rung.startswith("mcts"):
            opponent, mcts_iters = Player(Agent.MCTS), int(rung[4:])
        else:
            raise SystemExit(f"unknown rung {rung!r}")
        t0 = time.perf_counter()
        is_mcts = opponent.kind == Agent.MCTS
        block = args.block if args.block > 0 else args.games
        seq = SequentialRung(args.games, min_games=args.min_games)
        st = state.setdefault(rung, {
            "games": 0, "wins": 0, "losses": 0, "draws": 0,
            "blocks": 0, "secs": 0.0, "done": False})
        if st["done"]:
            print(json.dumps({"metric": "ladder_skip", "rung": rung,
                              "reason": "already done in resume state"}),
                  file=sys.stderr, flush=True)
            continue
        wins, losses, draws = st["wins"], st["losses"], st["draws"]
        n_blocks = st["blocks"]
        if st["games"]:
            seq.update(wins, st["games"])  # replay tally into the stop rule
        while not seq.done:
            n = min(block, args.games - seq.games)
            r = jax.random.fold_in(
                jax.random.fold_in(base_key, rung_i), n_blocks)
            res = play(
                bg.ENV, eval_fn, model, opponent, r, mcts_cfg,
                temperature=0.3,  # near-greedy for strength measurement
                num_games=n, round_limit=args.round_limit,
                mcts_iterations=mcts_iters,
                mcts_rollout_limit=args.rollout_limit if is_mcts else None,
                mcts_search_chunk=args.search_chunk if is_mcts else None,
                mcts_match_ckpt=(f"{args.match_ckpt}.{rung}.npz"
                                 if args.match_ckpt and is_mcts else None),
            )
            wins += res.wins_p1
            losses += res.wins_p2
            draws += res.draws
            n_blocks += 1
            seq.update(res.wins_p1, n)
            st.update(games=seq.games, wins=wins, losses=losses,
                      draws=draws, blocks=n_blocks,
                      secs=round(st["secs"] + time.perf_counter() - t0, 1))
            t0 = time.perf_counter()
            save_state()
            print(json.dumps({
                "metric": "ladder_block", "rung": rung, "games": seq.games,
                "wins": wins, "wilson95": [round(x, 4) for x in seq.ci],
                "secs": st["secs"],
            }), file=sys.stderr, flush=True)
        st["done"] = True
        save_state()
        lo, hi = seq.ci
        line = {
            "metric": "strength_ladder", "model": path,
            "name": args.name or None, "rung": rung,
            "games": seq.games, "wins": wins, "losses": losses,
            "draws": draws, "winrate": seq.winrate,
            "wilson95": [round(lo, 4), round(hi, 4)],
            "model_sims": args.sims, "round_limit": args.round_limit,
            "secs": round(st["secs"] + time.perf_counter() - t0, 1),
            "early_stopped": seq.games < args.games,
            "verdict": seq.verdict,
        }
        if is_mcts:
            line["rollout_limit"] = args.rollout_limit
        print(json.dumps(line), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
