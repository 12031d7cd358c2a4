"""bench.py resilience (VERDICT round-2 item 1).

BENCH_r02.json was rc=1 because the driver ran bench.py exactly once while
the axon tunnel was mid-recovery. The harness now runs the measurement in a
child process and the parent retries with backoff. These tests drive the
parent's retry/give-up logic with a deliberately broken backend; the
success path is exercised on the real chip (BASELINE.md round-3 table).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=120):
    env = dict(os.environ)
    env.pop("DIE_E_BENCH_CHILD", None)
    # The axon sitecustomize (when on PYTHONPATH) force-registers the TPU
    # plugin and overrides JAX_PLATFORMS (CLAUDE.md) — strip it so the bogus
    # platform below actually fails instead of silently using the tunnel.
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + [p for p in parts if p])
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def test_parent_retries_then_gives_up_rc1():
    proc = _run(
        {
            # An unknown platform makes every child fail fast at backend init,
            # the same failure class as BENCH_r02's UNAVAILABLE tunnel.
            "JAX_PLATFORMS": "definitely_not_a_backend",
            "DIE_E_BENCH_DEADLINE_S": "8",
            "DIE_E_BENCH_BACKOFF_S": "2",
        }
    )
    assert proc.returncode == 1
    assert "attempt 1 failed" in proc.stderr
    assert "attempt 2 failed" in proc.stderr  # it actually retried
    assert proc.stdout.strip() == ""  # no bogus JSON on the result stream


def test_child_env_var_runs_measurement_directly():
    # The child path must not recurse into the parent retry loop; with a
    # broken backend it should fail straight away (single attempt).
    proc = _run(
        {
            "JAX_PLATFORMS": "definitely_not_a_backend",
            "DIE_E_BENCH_CHILD": "1",
            "DIE_E_BENCH_DEADLINE_S": "8",
        }
    )
    # direct child: no parent wrapper output, nonzero exit, a traceback
    assert proc.returncode != 0
    assert "attempt" not in proc.stderr
