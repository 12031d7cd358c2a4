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
