"""Benchmark harness: backgammon env-steps/s/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config 3 shape): 4096 lockstep backgammon games;
each step computes the full [B,1352] legal-action mask (with exact
canonical-encoding + duplicate-state semantics), samples a uniform random
legal action, and applies it — the complete env hot path the self-play loop
exercises, fused as a jitted fori_loop on one chip.

Measurement notes (axon tunnel quirks discovered empirically):
* results are fetched with np.asarray — block_until_ready can return before
  remote execution completes on this backend;
* the timed call chains on the warmup call's OUTPUT states so its inputs
  differ (identical (program, inputs) pairs are served from a cache);
* warmup uses identical static arguments so compilation is excluded.

vs_baseline is against the BASELINE.md north-star target of 100k
env-steps/s/chip (the Rust reference publishes no numbers,
/root/repo/BASELINE.json published: {}).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4096
STEPS_PER_CALL = 16
TARGET = 100_000.0


@partial(jax.jit, static_argnames=("env", "steps"))
def _run_steps(env, states, rng, steps: int):
    def body(_, carry):
        states, rng = carry
        rng, sub = jax.random.split(rng)
        legal = jax.vmap(env.legal_mask)(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        action = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        states = jax.vmap(env.step)(states, action)
        return states, rng

    return jax.lax.fori_loop(0, steps, body, (states, rng))


def main():
    from die_e_tpu.envs import backgammon as bg

    seeds = jnp.arange(BATCH, dtype=jnp.uint32)
    states = jax.vmap(bg.init)(seeds)
    rng = jax.random.PRNGKey(0)

    # compile + warmup (same statics as the timed calls)
    states, rng = _run_steps(bg.ENV, states, rng, STEPS_PER_CALL)
    np.asarray(states.cnt)

    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        states, rng = _run_steps(bg.ENV, states, rng, STEPS_PER_CALL)
    np.asarray(states.cnt)
    dt = time.perf_counter() - t0

    steps_per_s = BATCH * STEPS_PER_CALL * n_calls / dt
    print(
        json.dumps(
            {
                "metric": "backgammon_env_steps_per_s_per_chip",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
