"""Stage-level profile of the backgammon legal-mask kernel.

The search ablation (bench/profile_search.py) shows the legal-mask kernel is
the single largest per-sim cost (~9 ms at B=1024, ~45% of the search).
This bench times cumulative stage prefixes of the staged kernel
(envs/backgammon.py: _mask_tables -> _mask_raw -> _mask_dedup) to attribute
that cost:

* tables — single-move legality tables + 52 intermediate states
* raw    — + per-action canonical filter, tree legality, signatures
* full   — + duplicate-resulting-state removal and the no-op bit

Each prefix runs ITERS times inside one jitted fori_loop with the dice re-
derived from the running checksum each iteration (a data dependency XLA
cannot hoist), so the axon tunnel's ~25 ms per-dispatch overhead is
amortized to noise.  np.asarray fetches; fresh seeds per call so the tunnel
never serves a cached (program, inputs) pair.

Usage: python -m bench.profile_mask [--batch 1024] [--iters 16] [--calls 2]
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--calls", type=int, default=2)
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

    @partial(jax.jit, static_argnames=("fn", "iters"))
    def run(states, salt, fn, iters):
        def body(i, carry):
            states, acc = carry
            # re-derive dice from the running checksum: a real data
            # dependency between iterations, same mask workload each time
            r0 = 1 + (acc + salt + i) % 6
            r1 = 1 + (acc * 7 + i) % 6
            roll = jnp.stack(
                [jnp.full((states.roll.shape[0],), r0, jnp.int32),
                 jnp.full((states.roll.shape[0],), r1, jnp.int32)], axis=1
            )
            states = states.replace(roll=roll)
            acc = jnp.sum(jax.vmap(fn)(states)) % 1009
            return states, acc

        return jax.lax.fori_loop(
            0, iters, body, (states, jnp.int32(0))
        )[1]

    states = jax.vmap(bg.init)(jnp.arange(args.batch, dtype=jnp.uint32))
    step_rng = jax.random.PRNGKey(0)
    for _ in range(4):  # advance to representative positions
        step_rng, sub = jax.random.split(step_rng)
        legal = jax.jit(jax.vmap(bg.legal_mask))(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        act = jax.random.categorical(sub, logits, -1).astype(jnp.int32)
        states = jax.jit(jax.vmap(bg.step))(states, act)

    results = {}
    for name, fn in (("tables", tables_sum), ("raw", raw_sum),
                     ("full", full_sum)):
        _ = np.asarray(run(states, jnp.int32(0), fn, args.iters))
        t0 = time.perf_counter()
        for i in range(args.calls):
            _ = np.asarray(run(states, jnp.int32(1 + i), fn, args.iters))
        dt = (time.perf_counter() - t0) / (args.calls * args.iters)
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
