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

Resilience (VERDICT round-2 item 1): after a tunnel crash the axon backend
needs minutes to recover, and a failed backend init is cached for the
lifetime of the process — so the measurement runs in a CHILD process and
the parent retries with backoff for up to ~8 minutes before giving up.
BENCH_r02.json was rc=1 purely because the tunnel was mid-recovery when the
driver ran this script once with no retry.

vs_baseline is against the BASELINE.md north-star target of 100k
env-steps/s/chip (the Rust reference publishes no numbers,
/root/repo/BASELINE.json published: {}).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 4096
STEPS_PER_CALL = 16
TARGET = 100_000.0

# Parent retry policy: the tunnel needs minutes to recover after a crash
# (CLAUDE.md); one wedged window must not erase the round's headline number.
RETRY_DEADLINE_S = float(os.environ.get("DIE_E_BENCH_DEADLINE_S", 480.0))
BACKOFFS_S = (20.0, 40.0, 60.0, 90.0, 120.0)
if "DIE_E_BENCH_BACKOFF_S" in os.environ:
    BACKOFFS_S = (float(os.environ["DIE_E_BENCH_BACKOFF_S"]),)
CHILD_TIMEOUT_S = 600.0
_CHILD_ENV = "DIE_E_BENCH_CHILD"


def run_bench() -> int:
    """The actual measurement (child process)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from die_e_tpu.envs import backgammon as bg

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

    # Preflight: a trivial op proves the backend is actually reachable before
    # we pay for compilation (and gives retries a fast failure signal).
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

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
    return 0


def main() -> int:
    if os.environ.get(_CHILD_ENV) == "1":
        return run_bench()

    deadline = time.time() + RETRY_DEADLINE_S
    env = dict(os.environ, **{_CHILD_ENV: "1"})
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=CHILD_TIMEOUT_S,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            out, err, rc = proc.stdout, proc.stderr, proc.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            err += "\n[bench parent] child timed out"
            rc = -1

        result_line = None
        for line in reversed(out.strip().splitlines()):
            try:
                parsed = json.loads(line)
                if isinstance(parsed, dict) and "metric" in parsed:
                    result_line = line
                    break
            except (json.JSONDecodeError, ValueError):
                continue

        if rc == 0 and result_line is not None:
            print(result_line)
            return 0

        remaining = deadline - time.time()
        tail = "\n".join(err.strip().splitlines()[-15:])
        print(
            f"[bench parent] attempt {attempt} failed (rc={rc}); "
            f"{remaining:.0f}s left before giving up\n{tail}",
            file=sys.stderr,
        )
        if remaining <= 0:
            return 1
        backoff = BACKOFFS_S[min(attempt - 1, len(BACKOFFS_S) - 1)]
        time.sleep(min(backoff, max(remaining, 1.0)))


if __name__ == "__main__":
    sys.exit(main())
