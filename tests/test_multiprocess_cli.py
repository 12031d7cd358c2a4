"""Multi-process PRODUCT path test: the real CLI on every simulated host.

Unlike tests/test_multiprocess.py (which drives the fused train_iteration
through a bespoke worker), this launches ``python -m die_e_tpu.cli.main
... learn`` itself on 2 OS processes (2 virtual CPU devices each) joined
via ``--coordinator/--num-processes/--process-id`` — the exact command a
pod deployment runs per host (SURVEY.md §2 rows 16/22; the reference is
strictly single-process, src/lib.rs:22-30).  Asserts:

* the learn loop completes end-to-end on both processes (self-play ->
  all-gathered memory -> global data-parallel SGD -> gate on process 0),
* every process logs IDENTICAL per-epoch losses and fragment counts (the
  all-gather makes the memory global; the gradient all-reduce makes the
  update global),
* only process 0 touches the filesystem: models/{game}/best exists, the
  gate events appear in process 0's metrics only, and the training-data
  dump is written once.

Exact loss equality with a 1-process run is NOT asserted: search rng draws
are batch-shaped (one stream per local actor batch), so host-sharding the
actors changes trajectories — the global GAME SET is identical (seed-
derived), the math per run is identical across its processes, but the
sampled games differ between host counts (documented in
parallel/multihost.py; the fused-path equivalence is covered by
tests/test_multiprocess.py).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CFG = """
temperature = 1.25
learn_iterations = 2
self_play_iterations = 1
num_epochs = 2
training_batch_size = 32
num_self_play_batches = 8
iterations = 12
exploration_const = 2
simulate_round_limit = 10
dirichlet_alpha = 0.3
dirichlet_epsilon = 0.25
wd = 0.0001
lr = 0.001
arena_num_games = 4
arena_round_limit = 10
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _events(path: Path):
    if not path.exists():
        return []
    return [json.loads(line) for line in path.read_text().splitlines()]


def _run_cluster(tmp_path, extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # --platform cpu does the forcing
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "die_e_tpu.cli.main",
             "--platform", "cpu",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "-c", "cfg.toml", "-g", "tictactoe",
             "--metrics-jsonl", "metrics.jsonl",
             "learn", *extra_args],
            env=env, cwd=tmp_path,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"


def test_cli_learn_two_processes(tmp_path):
    (tmp_path / "cfg.toml").write_text(CFG)
    _run_cluster(tmp_path)

    ev0 = _events(tmp_path / "metrics.jsonl")
    ev1 = _events(tmp_path / "metrics.jsonl.p1")
    assert ev0 and ev1

    # the all-gathered memory and all-reduced SGD are global: both
    # processes must see identical fragments and per-epoch losses
    def series(evs, event, key):
        return [e[key] for e in evs if e["event"] == event]

    frags0 = series(ev0, "self_play", "fragments")
    frags1 = series(ev1, "self_play", "fragments")
    assert frags0 == frags1 and len(frags0) == 2
    loss0 = series(ev0, "train_epoch", "loss")
    loss1 = series(ev1, "train_epoch", "loss")
    assert len(loss0) == 4  # 2 learn iters x 2 epochs
    assert loss0 == pytest.approx(loss1, rel=1e-6)

    # gating + checkpoints + data dumps are process-0 only
    gates0 = [e["result"] for e in ev0 if e["event"] == "gate"]
    assert gates0[0] == "no_best_promoted" and len(gates0) == 2
    assert not any(e["event"] == "gate" for e in ev1)
    assert (tmp_path / "models" / "tictactoe" / "best").exists()
    assert (tmp_path / "models" / "tictactoe" / "model_1").exists()
    run_dirs = list((tmp_path / "data" / "tictactoe").glob("run-*"))
    assert len(run_dirs) == 1
    assert (run_dirs[0] / "lrn-0" / "sp-0").exists()


def test_cli_learn_two_processes_resume(tmp_path):
    """Kill-and-resume on the cluster: a 1-iteration multi-process run
    followed by `learn --resume` with a raised total continues the SAME run
    id and iteration numbering on every process (all processes read the
    cursor process 0 wrote; full TrainState restore happens on each)."""
    (tmp_path / "cfg.toml").write_text(CFG.replace(
        "learn_iterations = 2", "learn_iterations = 1"))
    _run_cluster(tmp_path)
    meta = json.loads(
        (tmp_path / "models" / "tictactoe" / "latest_meta.json").read_text()
    )
    assert meta["next_learn_iter"] == 1

    (tmp_path / "cfg.toml").write_text(CFG)  # total now 2
    _run_cluster(tmp_path, extra_args=("--resume",))

    ev0 = _events(tmp_path / "metrics.jsonl")
    ev1 = _events(tmp_path / "metrics.jsonl.p1")
    # second launch resumed as lrn-1 in the same run dir on BOTH processes
    starts0 = [e for e in ev0 if e["event"] == "run_start"]
    assert [e["start_iter"] for e in starts0] == [0, 1]
    assert starts0[0]["run_id"] == starts0[1]["run_id"]
    starts1 = [e for e in ev1 if e["event"] == "run_start"]
    assert [e["start_iter"] for e in starts1] == [0, 1]
    assert starts1[1]["run_id"] == starts0[1]["run_id"]
    run_dirs = list((tmp_path / "data" / "tictactoe").glob("run-*"))
    assert len(run_dirs) == 1
    assert (run_dirs[0] / "lrn-1" / "sp-0").exists()
    assert (tmp_path / "models" / "tictactoe" / "model_1").exists()
    # the resumed iteration's losses still agree across processes
    loss0 = [e["loss"] for e in ev0 if e["event"] == "train_epoch"]
    loss1 = [e["loss"] for e in ev1 if e["event"] == "train_epoch"]
    assert loss0 == pytest.approx(loss1, rel=1e-6)
