"""Multi-host scaffolding (jax.distributed).

The reference is strictly single-process (SURVEY.md section 2: no NCCL/MPI/
Gloo anywhere, Cargo.toml has no comms dep); this is the scale-out layer the
TPU rebuild adds.  Within a slice, collectives ride ICI; across hosts the
runtime uses DCN — both inserted by XLA from shardings, never hand-written.

Usage on each host of a pod slice::

    initialize_multihost()            # reads env (coordinator, process id)
    mesh = make_train_mesh()          # global mesh over all chips
    seeds = process_batch_slice(global_batch, ...)  # this host's games

Single-process runs are unaffected (initialize is a no-op without a
cluster environment).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with cluster auto-detection; returns True
    if a multi-process runtime was set up."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and num_processes is None:
        # no cluster configured -> single process
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_batch_slice(global_batch: int, seed: int = 0):
    """Deterministic per-host slice of the global self-play batch: host i
    owns games [i*B/H, (i+1)*B/H) with per-game seeds folded from the run
    seed, so the global game set is identical regardless of host count."""
    from die_e_tpu.core.prng import per_game_seeds

    h = jax.process_count()
    i = jax.process_index()
    if global_batch % h:
        raise ValueError(f"global batch {global_batch} not divisible by {h} hosts")
    per = global_batch // h
    all_seeds = np.asarray(per_game_seeds(seed, global_batch))
    return all_seeds[i * per : (i + 1) * per]


def global_array_from_local(mesh, local_batch_tree):
    """Assemble host-local [B_local, ...] arrays into one global array
    sharded over the mesh's data axis
    (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from die_e_tpu.core.mesh import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch_tree,
    )


def put_global_batch(mesh, batch_tree):
    """Place HOST-REPLICATED [B, ...] arrays (every process holds the same
    full value) as global arrays sharded over the mesh's data axis.

    The multi-process learn loop trains every host on the IDENTICAL global
    memory (see :func:`allgather_memory`), so each process simply uploads
    the contiguous row range its own devices cover; XLA then runs the SGD
    step data-parallel with a global gradient all-reduce.  Requires B to be
    divisible by the process count (training batches are fixed-size)."""
    h = jax.process_count()
    i = jax.process_index()

    def put(x):
        x = np.asarray(x)
        if x.shape[0] % h:
            raise ValueError(
                f"batch rows {x.shape[0]} not divisible by {h} processes"
            )
        per = x.shape[0] // h
        return global_array_from_local(mesh, x[i * per:(i + 1) * per])

    return jax.tree_util.tree_map(put, batch_tree)


def allgather_memory(*host_arrays):
    """All-gather variable-length host-local fragment arrays across
    processes; every process returns the identical concatenation in process
    order (the global replay memory of the reference's learn loop,
    alpha_parallel.rs:48-62, rebuilt host-sharded: each host's actors
    produce a slice, the learner trains on the union).

    Fragment counts differ per host (games have different lengths), so each
    array is padded to the max count before the collective and trimmed
    after.  Rides the jax.distributed backend (gloo on CPU, DCN on a pod).

    CONTRACT: every array in one call must share the same local row count
    (all are trimmed by the FIRST array's per-host counts).  Arrays with a
    different cardinality (e.g. per-game winners alongside per-fragment
    memory) must go in their own call.
    """
    from jax.experimental import multihost_utils

    for x in host_arrays[1:]:
        if x.shape[0] != host_arrays[0].shape[0]:
            raise ValueError(
                "allgather_memory arrays must share the local row count "
                f"(got {x.shape[0]} vs {host_arrays[0].shape[0]}); gather "
                "different-cardinality arrays in separate calls"
            )

    counts = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([host_arrays[0].shape[0]], np.int64)
        )
    ).reshape(-1)
    n_max = int(counts.max()) if counts.size else 0
    out = []
    for x in host_arrays:
        x = np.asarray(x)
        pad = np.zeros((n_max - x.shape[0],) + x.shape[1:], x.dtype)
        stacked = multihost_utils.process_allgather(
            np.concatenate([x, pad]) if n_max > x.shape[0] else x
        )  # [H, n_max, ...]
        stacked = np.asarray(stacked)
        out.append(
            np.concatenate([stacked[h, : counts[h]] for h in range(len(counts))])
        )
    return tuple(out)


def allgather_memory_sparse(obs, ps, outcome, obs_int8=False, stats=None):
    """Bandwidth-lean :func:`allgather_memory` for the actor->learner
    replay transfer (VERDICT r3 weak #4: the dense form ships ~1.8 GB of
    [N, 1352] f32 prob rows per host per sp iteration at the reference
    workload).  The wire format mirrors the single-host transfer
    discipline: observations as int8 when the tensorizer is integer-exact,
    prob rows CSR-packed ((idx uint16, val f32) over the <=sims nonzero
    entries, train/learner._sparsify_rows), outcomes as int8 (+-1/0).
    Every host returns the identical dense (obs f32, ps f32, outcome f32)
    concatenation — bit-equal to the dense gather's output.

    ``stats`` (optional dict) receives {"bytes_wire", "bytes_dense"} for
    the transfer-cut bookkeeping the learn loop logs.
    """
    from jax.experimental import multihost_utils

    from die_e_tpu.train.learner import _sparsify_rows

    obs = np.asarray(obs)
    ps = np.asarray(ps)
    outcome = np.asarray(outcome)
    a = ps.shape[1]
    idx, val = _sparsify_rows(ps)
    # pad the column dim to the max K over hosts (K is already rounded to
    # a multiple of 64, so this adds at most a handful of distinct shapes)
    k_all = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([idx.shape[1]], np.int64)
        )
    ).reshape(-1)
    k = int(k_all.max()) if k_all.size else idx.shape[1]
    if k > idx.shape[1]:
        padc = ((0, 0), (0, k - idx.shape[1]))
        idx = np.pad(idx, padc)
        val = np.pad(val, padc)
    obs_w = obs.astype(np.int8) if obs_int8 else obs
    out_w = outcome.astype(np.int8)  # outcomes are exactly -1/0/+1
    g_obs, g_idx, g_val, g_out = allgather_memory(obs_w, idx, val, out_w)
    n = g_idx.shape[0]
    ps_dense = np.zeros((n, a), np.float32)
    mask = g_val != 0.0  # padding slots are (col 0, val 0); real vals != 0
    rows = np.nonzero(mask)[0]
    ps_dense[rows, g_idx[mask].astype(np.int64)] = g_val[mask]
    if stats is not None:
        h = jax.process_count()
        stats["bytes_wire"] = int(
            (obs_w.nbytes + idx.nbytes + val.nbytes + out_w.nbytes) * h
        )
        stats["bytes_dense"] = int(
            (obs.nbytes + ps.nbytes + outcome.nbytes) * h
        )
    return (
        g_obs.astype(np.float32) if obs_int8 else g_obs,
        ps_dense,
        g_out.astype(np.float32),
    )
