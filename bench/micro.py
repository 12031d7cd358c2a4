"""Component microbenchmarks (the reference's criterion harness analog,
reference benches/my_benchmark.rs — which benches policy-masking and
expansion variants; here: env kernels, search, net forward).

Prints one JSON line per metric.  Usage:

    python -m bench.micro [--batch 4096] [--sims 100]

Timing rules for the axon tunnel (see bench.py): chained inputs so no call
repeats a (program, inputs) pair, np.asarray fetches (block_until_ready can
return early), warmup with identical static arguments.

Note on net/train numbers: these call the jitted step once per host-loop
iteration, so they include the tunnel's per-dispatch overhead (~25 ms) —
they measure what a host-driven loop actually gets.  Inside fused programs
the same ResNet forward costs ~9.5 ms per 1024-batch (see the search
breakdown in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    jax.tree_util.tree_map(np.asarray, x)


def bench_env_step(batch: int, steps: int = 16, calls: int = 4):
    from die_e_tpu.envs import backgammon as bg

    @partial(jax.jit, static_argnames=("steps",))
    def run(states, rng, steps):
        def body(_, carry):
            states, rng = carry
            rng, sub = jax.random.split(rng)
            legal = jax.vmap(bg.legal_mask)(states)
            logits = jnp.where(legal, 0.0, -jnp.inf)
            action = jax.random.categorical(sub, logits, -1).astype(jnp.int32)
            return jax.vmap(bg.step)(states, action), rng

        return jax.lax.fori_loop(0, steps, body, (states, rng))

    states = jax.vmap(bg.init)(jnp.arange(batch, dtype=jnp.uint32))
    rng = jax.random.PRNGKey(0)
    states, rng = run(states, rng, steps)
    _fetch(states.cnt)
    t0 = time.perf_counter()
    for _ in range(calls):
        states, rng = run(states, rng, steps)
    _fetch(states.cnt)
    dt = time.perf_counter() - t0
    return {"metric": "bg_env_steps_per_s", "value": round(batch * steps * calls / dt, 1),
            "unit": "steps/s"}


def _net_dtype(dtype: str):
    return jnp.bfloat16 if dtype == "bf16" else jnp.float32


def bench_net_forward(batch: int, calls: int = 8, dtype: str = "f32"):
    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train.learner import net_eval_fn

    net = make_net(bg.SPEC, dtype=_net_dtype(dtype))
    variables = init_params(net, jax.random.PRNGKey(0))
    eval_fn = jax.jit(net_eval_fn(net))
    obs = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 6, 6))
    p, v = eval_fn(variables, obs)
    _fetch(v)
    t0 = time.perf_counter()
    for i in range(calls):
        p, v = eval_fn(variables, obs + v.mean())  # chain on prior output
    _fetch(v)
    dt = time.perf_counter() - t0
    return {"metric": f"resnet256x19_fwd_samples_per_s_{dtype}",
            "value": round(batch * calls / dt, 1), "unit": "samples/s"}


def bench_search(batch: int, sims: int, calls: int = 2, dtype: str = "f32"):
    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.search.alpha import alpha_search
    from die_e_tpu.train.learner import net_eval_fn

    net = make_net(bg.SPEC, dtype=_net_dtype(dtype))
    variables = init_params(net, jax.random.PRNGKey(0))
    eval_fn = net_eval_fn(net)
    states = jax.vmap(bg.init)(jnp.arange(batch, dtype=jnp.uint32))
    r = alpha_search(bg.ENV, eval_fn, variables, states,
                     jax.random.PRNGKey(0), iterations=sims, c=2.0)
    _fetch(r.visit_probs)
    t0 = time.perf_counter()
    for i in range(calls):
        r = alpha_search(bg.ENV, eval_fn, variables, states,
                         jax.random.PRNGKey(1 + i), iterations=sims, c=2.0)
        _fetch(r.visit_probs)
    dt = time.perf_counter() - t0
    return {"metric": f"mcts_sims_per_s_full_resnet_{dtype}",
            "value": round(batch * sims * calls / dt, 1), "unit": "sims/s"}


def bench_train_step(batch: int = 256, calls: int = 8):
    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import make_net
    from die_e_tpu.train.learner import (
        create_train_state, make_optimizer, train_step,
    )

    net = make_net(bg.SPEC)
    tx = make_optimizer()
    state = create_train_state(net, jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 6, 6))
    ps = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (batch, 1352)), -1)
    outcome = jnp.zeros((batch,))
    w = jnp.ones((batch,))
    state, m = train_step(net, tx, state, obs, ps, outcome, w)
    _fetch(m["loss"])
    t0 = time.perf_counter()
    for _ in range(calls):
        state, m = train_step(net, tx, state, obs, ps, outcome, w)
    _fetch(m["loss"])
    dt = time.perf_counter() - t0
    return {"metric": "train_samples_per_s",
            "value": round(batch * calls / dt, 1), "unit": "samples/s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--search-batch", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--only", default=None,
                    help="env|net|search|train (default: all)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="inference compute dtype for net/search benches")
    args = ap.parse_args()

    benches = {
        "env": lambda: bench_env_step(args.batch),
        "net": lambda: bench_net_forward(args.search_batch, dtype=args.dtype),
        "search": lambda: bench_search(args.search_batch, args.sims,
                                       dtype=args.dtype),
        "train": lambda: bench_train_step(),
    }
    for name, fn in benches.items():
        if args.only and name != args.only:
            continue
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
