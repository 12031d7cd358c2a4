"""Multi-process distribution test (jax.distributed, CPU simulation).

Launches 2 OS processes (tests/mp_worker.py), each owning 2 virtual CPU
devices, joined into one 4-device global mesh via
``jax.distributed.initialize`` with gloo collectives — the CPU stand-in for
a multi-host TPU pod (SURVEY.md §4 test plan; the reference has no
multi-host at all, src/lib.rs:22-30).  Asserts:

* both processes complete a fused self-play+train ``train_iteration`` over
  the globally-sharded batch,
* they report the SAME loss/updated-params (the gradient all-reduce is
  global),
* that loss equals a single-process run over the identical global game set
  (sharding and process layout must not change the math).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_iteration_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [
        json.loads((tmp_path / f"proc{i}.json").read_text()) for i in range(2)
    ]
    # the all-reduced update is global: every process sees identical results
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["fragments"] == results[1]["fragments"]
    assert results[0]["param0"] == pytest.approx(
        results[1]["param0"], rel=1e-6
    )

    # single-process reference over the SAME global game set
    import dataclasses

    import jax
    import numpy as np

    from die_e_tpu.envs import tictactoe as ttt
    from die_e_tpu.nets.resnet import make_net
    from die_e_tpu.parallel.distributed import make_train_mesh, train_iteration
    from die_e_tpu.parallel.multihost import process_batch_slice
    from die_e_tpu.train.learner import (
        create_train_state,
        make_optimizer,
        net_eval_fn,
    )

    seeds = process_batch_slice(16, seed=0)  # single process: full batch
    states = jax.vmap(ttt.init)(jax.numpy.asarray(seeds, jax.numpy.uint32))
    mesh = make_train_mesh(1, 1, jax.devices()[:1])
    del mesh  # 1-device run needs no placement
    spec = dataclasses.replace(ttt.SPEC, n_filters=8, n_res_blocks=1)
    net = make_net(spec)
    state = create_train_state(net, jax.random.PRNGKey(0))
    _, metrics = train_iteration(
        ttt.ENV, net, make_optimizer(), net_eval_fn(net), state, states,
        jax.random.PRNGKey(1), iterations=4, round_limit=6,
    )
    assert float(metrics["loss"]) == pytest.approx(
        results[0]["loss"], rel=1e-4
    )
    assert float(metrics["fragments"]) == results[0]["fragments"]
