from die_e_tpu.parallel.distributed import (
    make_train_mesh,
    shard_trajectory_batch,
    train_iteration,
)
from die_e_tpu.parallel.multihost import initialize_multihost, process_batch_slice

__all__ = [
    "make_train_mesh",
    "shard_trajectory_batch",
    "train_iteration",
    "initialize_multihost",
    "process_batch_slice",
]
