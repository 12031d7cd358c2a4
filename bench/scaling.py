"""Scaling-efficiency benchmark: the fused self-play + train step over
1, 2, 4, ... devices (BASELINE.md: ">=80% scaling efficiency to multi-host").

On real multi-chip hardware this measures ICI scaling of the data axis; in
this development environment only one real chip (or virtual CPU devices
sharing the same host cores) is available, so wall-clock efficiency numbers
are only meaningful on a real slice — the harness is ready for one.

Usage:
    python -m bench.scaling                 # all available devices
    python -m bench.scaling --per-chip 64   # games per chip (weak scaling)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from die_e_tpu.core.mesh import DATA_AXIS
from die_e_tpu.envs import backgammon as bg
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.parallel.distributed import make_train_mesh, train_iteration
from die_e_tpu.train.learner import (
    create_train_state,
    make_optimizer,
    net_eval_fn,
)


def run_one(n_devices: int, per_chip: int, sims: int, rounds: int,
            filters: int, blocks: int):
    mesh = make_train_mesh(n_devices, 1, jax.devices()[:n_devices])
    spec = dataclasses.replace(bg.SPEC, n_filters=filters, n_res_blocks=blocks)
    net = make_net(spec)
    tx = make_optimizer()
    state = create_train_state(net, jax.random.PRNGKey(0))
    eval_fn = net_eval_fn(net)

    batch = per_chip * n_devices
    init_states = jax.vmap(bg.init)(jnp.arange(batch, dtype=jnp.uint32))
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    init_states = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sh), init_states
    )
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    state, metrics = train_iteration(
        bg.ENV, net, tx, eval_fn, state, init_states, jax.random.PRNGKey(1),
        iterations=sims, round_limit=rounds,
    )
    np.asarray(metrics["loss"])  # warm/compile

    t0 = time.perf_counter()
    state, metrics = train_iteration(
        bg.ENV, net, tx, eval_fn, state, init_states, jax.random.PRNGKey(2),
        iterations=sims, round_limit=rounds,
    )
    np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * rounds * sims / dt  # sims/s across the mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-chip", type=int, default=64)
    ap.add_argument("--sims", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--filters", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=2)
    args = ap.parse_args()

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    for n in sizes:
        rate = run_one(n, args.per_chip, args.sims, args.rounds,
                       args.filters, args.blocks)
        if base is None:
            base = rate
        eff = rate / (base * n)
        print(json.dumps({
            "metric": "scaling_sims_per_s", "devices": n,
            "value": round(rate, 1), "unit": "sims/s",
            "efficiency_vs_1chip": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
