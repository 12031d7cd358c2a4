"""Calibrate per-program cost of the chunked pure-MCTS arena search.

The tunnel kills single XLA executions past ~15-45 s and randomly wedges
under sustained dispatch load (CLAUDE.md), and two mcts400 ladder rungs
died mid-block this round.  This measures the actual per-chunk device time
of ``simple_search_hosted`` (die_e_tpu/search/simple.py) across rung sizes
(tree capacity = iterations+1 scales the array-tree traffic) so the ladder
can pick ``--search-chunk`` to keep programs ~1-2 s and estimate block
walls before committing a measurement window.

Usage: python -m bench.mcts_chunk_cal [--batch 16] [--rungs 100,400,1000]
       [--chunk 10] [--rollout-limit 60]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rungs", default="100,400,1000")
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--rollout-limit", type=int, default=60)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.search.simple import (
        simple_search_chunk, simple_search_init)

    import jax.numpy as jnp

    env = bg.ENV
    rng = jax.random.PRNGKey(0)
    rng, r = jax.random.split(rng)
    seeds = jax.random.randint(
        r, (args.batch,), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    states = jax.vmap(env.init)(seeds)

    for rung in (int(x) for x in args.rungs.split(",")):
        tree, player = simple_search_init(env, states, capacity=rung + 1)
        # warm up / compile this capacity's program
        t0 = time.perf_counter()
        tree, rng = simple_search_chunk(
            env, tree, states, rng, player, n_iters=args.chunk, c=2.0,
            rollout_limit=args.rollout_limit)
        np.asarray(tree.visits[:, 0])  # real fetch (tunnel: async dispatch)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            tree, rng = simple_search_chunk(
                env, tree, states, rng, player, n_iters=args.chunk, c=2.0,
                rollout_limit=args.rollout_limit)
            np.asarray(tree.visits[:, 0])
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": "mcts_chunk_secs", "rung": rung, "batch": args.batch,
            "chunk": args.chunk, "rollout_limit": args.rollout_limit,
            "compile_s": round(compile_s, 2),
            "per_chunk_s": round(float(np.median(times)), 3),
            "per_sim_ms": round(1e3 * float(np.median(times)) / args.chunk, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
