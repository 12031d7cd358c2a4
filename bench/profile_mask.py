"""Stage-level profile of the backgammon legal-mask kernel.

The search ablation (bench/profile_search.py) shows the legal-mask kernel is
the single largest per-sim cost (~9 ms at B=1024, ~45% of the search).
This bench times cumulative stage prefixes of the staged kernel
(envs/backgammon.py: _mask_tables -> _mask_raw -> _mask_dedup) to attribute
that cost:

* tables — single-move legality tables + 52 intermediate states
* raw    — + per-action canonical filter, tree legality, signatures
* full   — + duplicate-resulting-state removal and the no-op bit

Each prefix is one jitted vmapped program over [B] states; a scalar
checksum is returned so fetch cost is constant.  Chained rng per call
(axon tunnel caches identical (program, inputs) pairs).

Usage: python -m bench.profile_mask [--batch 1024] [--calls 4]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()

    from die_e_tpu.envs import backgammon as bg

    def tables_sum(state):
        tb = bg._mask_tables(state)
        return (jnp.sum(tb["legal2"].astype(jnp.int32))
                + jnp.sum(tb["any2"].astype(jnp.int32)))

    def raw_sum(state):
        tb = bg._mask_tables(state)
        raw, keys, prio = bg._mask_raw(state, tb)
        return (jnp.sum(raw.astype(jnp.int32)) + jnp.sum(keys % 97)
                + jnp.sum(prio % 97))

    def full_sum(state):
        return jnp.sum(bg.legal_mask(state).astype(jnp.int32))

    @partial(jax.jit, static_argnames=("fn",))
    def run(states, seeds, fn):
        # perturb per-call via fresh seeds so the tunnel cache never hits
        states = states.replace(seed=seeds)
        return jnp.sum(jax.vmap(fn)(states))

    states = jax.vmap(bg.init)(jnp.arange(args.batch, dtype=jnp.uint32))
    # advance a few plies for representative positions
    step_rng = jax.random.PRNGKey(0)
    for _ in range(4):
        step_rng, sub = jax.random.split(step_rng)
        legal = jax.jit(jax.vmap(bg.legal_mask))(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        act = jax.random.categorical(sub, logits, -1).astype(jnp.int32)
        states = jax.jit(jax.vmap(bg.step))(states, act)

    results = {}
    for name, fn in (("tables", tables_sum), ("raw", raw_sum),
                     ("full", full_sum)):
        seeds0 = jnp.arange(args.batch, dtype=jnp.uint32)
        _ = np.asarray(run(states, seeds0, fn))  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.calls):
            seeds = seeds0 + jnp.uint32(1000 + i)
            _ = np.asarray(run(states, seeds, fn))
        dt = (time.perf_counter() - t0) / args.calls
        results[name] = dt * 1e3
        print(json.dumps({
            "metric": f"legal_mask_stage_{name}",
            "batch": args.batch, "ms_per_call": round(dt * 1e3, 3),
            "per_game_us": round(dt / args.batch * 1e6, 2)}), flush=True)

    print(json.dumps({
        "metric": "legal_mask_stage_deltas_ms",
        "tables": round(results["tables"], 3),
        "raw_extra": round(results["raw"] - results["tables"], 3),
        "dedup_extra": round(results["full"] - results["raw"], 3),
        "full": round(results["full"], 3)}), flush=True)


if __name__ == "__main__":
    main()
