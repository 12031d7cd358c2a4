"""Ablation profile of the batched PUCT search (VERDICT round-1 item 5).

Decomposes the per-sim cost of ``alpha_search`` at the self-play shape by
swapping components for near-free stand-ins and differencing wall times:

* ``full``       — real ResNet eval + real legal-mask kernel
* ``dummy_eval`` — uniform policy / zero value (search mechanics + mask)
* ``cheap_mask`` — legal_mask replaced by all-ones (mechanics + NN)
* ``bare``       — both swapped (pure tree mechanics: select/allocate/
                   backprop/observe/root bookkeeping)

cost(NN) ~ full - dummy_eval;  cost(mask) ~ full - cheap_mask;
cost(mechanics) ~ bare.  Also sweeps sims to expose the O(N) scaling of the
masked reductions over the node axis (capacity N = sims + 1).

Prints one JSON line per measurement.  Timing rules per bench.py: chained
rng inputs (the axon tunnel caches identical (program, inputs) pairs) and
np.asarray fetches.

Usage: python -m bench.profile_search [--batch 1024] [--sims 100]
       [--dtype f32|bf16] [--sweep-sims] [--trace DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    jax.tree_util.tree_map(np.asarray, x)


def _dummy_eval(params, obs):
    """Uniform policy + zero value; stable module-level fn (static jit arg)."""
    b = obs.shape[0]
    del params
    p = jnp.full((b, 1352), 1.0 / 1352.0)
    v = jnp.zeros((b, 1))
    return p, v


def _ones_mask(state):
    """All-actions-legal stand-in for the legal-mask kernel."""
    del state
    return jnp.ones((1352,), bool)


def _time_search(env, eval_fn, variables, states, sims, calls=2, label=""):
    from die_e_tpu.search.alpha import alpha_search

    r = alpha_search(env, eval_fn, variables, states, jax.random.PRNGKey(0),
                     iterations=sims, c=2.0)
    _fetch(r.visit_probs)
    t0 = time.perf_counter()
    for i in range(calls):
        r = alpha_search(env, eval_fn, variables, states,
                         jax.random.PRNGKey(1 + i), iterations=sims, c=2.0)
        _fetch(r.visit_probs)
    dt = time.perf_counter() - t0
    b = states.player.shape[0]
    per_sim_ms = dt / calls / sims * 1e3
    return {"metric": f"search_ablation_{label}",
            "batch": b, "sims": sims,
            "value": round(b * sims * calls / dt, 1), "unit": "sims/s",
            "ms_per_sim": round(per_sim_ms, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--sweep-sims", action="store_true")
    ap.add_argument("--only", default=None,
                    help="full|dummy_eval|cheap_mask|bare")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of one full search "
                         "into this directory")
    args = ap.parse_args()

    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train.learner import net_eval_fn

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    net = make_net(bg.SPEC, dtype=dtype)
    variables = init_params(net, jax.random.PRNGKey(0))
    eval_fn = net_eval_fn(net)
    states = jax.vmap(bg.init)(jnp.arange(args.batch, dtype=jnp.uint32))

    cheap_env = dataclasses.replace(bg.ENV, legal_mask=_ones_mask)
    cases = {
        "full": (bg.ENV, eval_fn),
        "dummy_eval": (bg.ENV, _dummy_eval),
        "cheap_mask": (cheap_env, eval_fn),
        "bare": (cheap_env, _dummy_eval),
    }
    results = {}
    for label, (env, ef) in cases.items():
        if args.only and label != args.only:
            continue
        r = _time_search(env, ef, variables, states, args.sims, label=label)
        results[label] = r
        print(json.dumps(r), flush=True)

    if len(results) == 4:
        f, d, c, b = (results[k]["ms_per_sim"]
                      for k in ("full", "dummy_eval", "cheap_mask", "bare"))
        print(json.dumps({
            "metric": "search_cost_decomposition_ms_per_sim",
            "nn_eval": round(f - d, 3), "legal_mask": round(f - c, 3),
            "mechanics": round(b, 3), "total": round(f, 3),
            "unaccounted": round(f - (f - d) - (f - c) - b, 3)}), flush=True)

    if args.sweep_sims:
        for sims in (25, 50, 100, 200):
            r = _time_search(bg.ENV, _dummy_eval, variables, states, sims,
                             label=f"dummy_eval_s{sims}")
            print(json.dumps(r), flush=True)

    if args.trace:
        from die_e_tpu.search.alpha import alpha_search
        with jax.profiler.trace(args.trace):
            r = alpha_search(bg.ENV, eval_fn, variables, states,
                             jax.random.PRNGKey(99), iterations=args.sims,
                             c=2.0)
            _fetch(r.visit_probs)
        print(json.dumps({"metric": "trace_written", "dir": args.trace}),
              flush=True)


if __name__ == "__main__":
    main()
