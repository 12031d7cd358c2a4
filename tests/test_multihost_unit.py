"""Single-process unit behavior of the multi-host helpers (the cross-process
semantics are covered by tests/test_multiprocess*.py; these pin the
degenerate 1-process forms and input validation)."""

import jax
import numpy as np
import pytest

from die_e_tpu.core.mesh import make_mesh
from die_e_tpu.parallel.multihost import (
    allgather_memory,
    initialize_multihost,
    put_global_batch,
)


def test_initialize_noop_without_cluster(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False


def test_allgather_memory_single_process_identity():
    obs = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = np.zeros(3, np.float32)
    g_obs, g_out = allgather_memory(obs, out)
    np.testing.assert_array_equal(g_obs, obs)
    np.testing.assert_array_equal(g_out, out)


def test_put_global_batch_shards_rows():
    mesh = make_mesh(8, 1, jax.devices()[:8])
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    g = put_global_batch(mesh, {"x": x})["x"]
    np.testing.assert_array_equal(np.asarray(g), x)
    assert len(g.sharding.device_set) == 8


def test_put_global_batch_requires_data_axis_divisibility():
    # rows must divide over the mesh's DATA axis (8 here) — the learn loop
    # validates training_batch_size against this up front so a bad config
    # fails with a clear message instead of deep inside device placement
    mesh = make_mesh(8, 1, jax.devices()[:8])
    with pytest.raises(ValueError, match="divisible"):
        put_global_batch(mesh, np.zeros((3, 2), np.float32))


def test_allgather_memory_rejects_mismatched_row_counts():
    """ADVICE r3: per-game arrays (winner) must not ride in the same call
    as per-fragment arrays — all arrays are trimmed by the first array's
    counts, silently zero-padding the shorter one."""
    frags = np.zeros((10, 4), np.float32)
    winner = np.zeros((2,), np.int32)
    with pytest.raises(ValueError, match="row count"):
        allgather_memory(frags, winner)


def test_allgather_memory_sparse_roundtrip_identity():
    """Single-process form: the CSR wire format must reproduce the dense
    (obs, ps, outcome) exactly, including int8 obs round-trip and rows
    whose support includes column 0."""
    from die_e_tpu.parallel.multihost import allgather_memory_sparse

    rng = np.random.default_rng(5)
    n, a = 40, 500  # wide action space: the regime the CSR format targets
    obs = rng.integers(-3, 4, size=(n, 2, 2)).astype(np.float32)
    ps = np.zeros((n, a), np.float32)
    for i in range(n):
        k = rng.integers(0, 7)
        cols = rng.choice(a, size=k, replace=False)
        ps[i, cols] = rng.random(k).astype(np.float32) + 0.01
    ps[0, 0] = 0.5  # col-0 support must survive the (0, 0) padding slots
    outcome = rng.choice([-1.0, 0.0, 1.0], size=n).astype(np.float32)
    stats = {}
    g_obs, g_ps, g_out = allgather_memory_sparse(
        obs, ps, outcome, obs_int8=True, stats=stats
    )
    np.testing.assert_array_equal(g_obs, obs)
    assert g_obs.dtype == np.float32
    np.testing.assert_array_equal(g_ps, ps)
    np.testing.assert_array_equal(g_out, outcome)
    assert stats["bytes_wire"] < stats["bytes_dense"]
