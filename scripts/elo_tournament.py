"""Elo tournament: round-robin arena matches between checkpoints + anchors.

Establishes the BASELINE "Elo" row on an absolute anchored ladder (the
reference publishes no Elo, README.md:1-113): every named player — model
checkpoints from the long run plus fixed opponents (random, pure MCTS at
given rollout budgets) — plays every other, results are appended as JSONL
match rows, and ratings are fit with die_e_tpu.arena.elo.compute_elo
anchored at random=0.

Match rows are cached in --out: pairs already present are skipped, so the
tournament can be grown incrementally across sessions (add a checkpoint,
re-run, only the new pairs play).

Usage:
    python scripts/elo_tournament.py \
        --models model_0=runs/bg_full/models/backgammon/model_0,\
best=runs/bg_full/models/backgammon/best \
        [--anchors random,mcts100,mcts400] [--games 64] [--sims 100]
        [--out runs/bg_full/elo_matches.jsonl]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    # the axon sitecustomize PJRT plugin OVERRIDES JAX_PLATFORMS=cpu
    # (CLAUDE.md) — force post-import, or a "CPU" run lands on the chip
    jax.config.update("jax_platforms", "cpu")


def parse_models(spec: str) -> dict[str, str]:
    out = {}
    for item in spec.split(","):
        if not item.strip():
            continue
        name, _, path = item.partition("=")
        if not path:
            raise SystemExit(f"--models item {item!r} must be name=path")
        out[name.strip()] = path.strip()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True,
                    help="comma list of name=checkpoint_dir")
    ap.add_argument("--anchors", default="random,mcts100,mcts400",
                    help="comma list of random|mctsN rungs")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--sims", type=int, default=100,
                    help="model PUCT sims per move")
    ap.add_argument("--round-limit", type=int, default=300)
    ap.add_argument("--rollout-limit", type=int, default=60,
                    help="pure-MCTS anchor playout depth cap")
    ap.add_argument("--search-chunk", type=int, default=20,
                    help="pure-MCTS iterations per device program")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--negamax", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse)")
    ap.add_argument("--skip-anchor-pairs", action="store_true",
                    help="only model-vs-model and model-vs-anchor pairs")
    ap.add_argument("--out", default="runs/bg_full/elo_matches.jsonl")
    args = ap.parse_args()

    from die_e_tpu.arena.elo import compute_elo, matches_from_records
    from die_e_tpu.arena.versus import Agent, Player, play
    from die_e_tpu.core.config import MctsConfig
    from die_e_tpu.core.mesh import compute_dtype
    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train import checkpoint as ckpt
    from die_e_tpu.train.learner import net_eval_fn

    template = init_params(make_net(bg.SPEC), jax.random.PRNGKey(0))
    eval_fn = net_eval_fn(make_net(bg.SPEC, dtype=compute_dtype()))

    players: dict[str, tuple[Player, int | None]] = {}
    for name, path in parse_models(args.models).items():
        variables = ckpt.restore_variables(path, template)
        players[name] = (Player(Agent.MODEL, variables), None)
    model_names = set(players)
    for rung in args.anchors.split(","):
        rung = rung.strip()
        if not rung:
            continue
        if rung == "random":
            players[rung] = (Player(Agent.RANDOM), None)
        elif rung.startswith("mcts"):
            players[rung] = (Player(Agent.MCTS), int(rung[4:]))
        else:
            raise SystemExit(f"unknown anchor {rung!r}")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done_pairs = set()
    rows = []
    if out_path.exists():
        with open(out_path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    rows.append(rec)
                    done_pairs.add(
                        frozenset((rec["player_a"], rec["player_b"])))

    mcts_cfg = MctsConfig(
        iterations=args.sims, c=2.0, simulate_round_limit=args.round_limit,
        dirichlet_alpha=0.3, dirichlet_epsilon=0.25, negamax=args.negamax,
    )
    rng = jax.random.PRNGKey(args.seed)
    names = sorted(players)
    for a, b in itertools.combinations(names, 2):
        if frozenset((a, b)) in done_pairs:
            continue
        if args.skip_anchor_pairs and not (
                a in model_names or b in model_names):
            continue
        # pure-MCTS budgets are per-agent; two different budgets in one
        # match need the override on the MCTS side only — play() takes a
        # single mcts_iterations, so matches between two mcts anchors with
        # different budgets are ordered (stronger budget as the override
        # applies to both); skip same-kind anchor pairs instead.
        p_a, it_a = players[a]
        p_b, it_b = players[b]
        if p_a.kind == Agent.MCTS and p_b.kind == Agent.MCTS and it_a != it_b:
            continue  # play() shares one rollout budget per match
        mcts_iters = it_a if it_a is not None else it_b
        has_mcts = Agent.MCTS in (p_a.kind, p_b.kind)
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        res = play(
            bg.ENV, eval_fn, p_a, p_b, r, mcts_cfg,
            temperature=0.3,  # near-greedy for strength measurement
            num_games=args.games, round_limit=args.round_limit,
            mcts_iterations=mcts_iters,
            mcts_rollout_limit=args.rollout_limit if has_mcts else None,
            mcts_search_chunk=args.search_chunk if has_mcts else None,
        )
        rec = {
            "metric": "elo_match", "player_a": a, "player_b": b,
            "wins_a": res.wins_p1, "wins_b": res.wins_p2,
            "draws": res.draws, "games": args.games,
            "model_sims": args.sims, "round_limit": args.round_limit,
            "secs": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    anchor = "random" if "random" in players else names[0]
    match_list = matches_from_records(rows)
    ratings = compute_elo(match_list, anchor=anchor)
    from die_e_tpu.arena.elo import bootstrap_elo

    cis = bootstrap_elo(match_list, anchor=anchor, n_boot=300,
                        seed=args.seed)
    summary = {"metric": "elo_ratings", "anchor": anchor,
               "ratings": {k: round(v, 1) for k, v in sorted(
                   ratings.items(), key=lambda kv: -kv[1])},
               "ci95": {k: [round(lo, 1), round(hi, 1)]
                        for k, (lo, hi) in sorted(
                            cis.items(), key=lambda kv: -kv[1][0])}}
    print(json.dumps(summary), flush=True)
    with open(out_path.with_suffix(".ratings.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
