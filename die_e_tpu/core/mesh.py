"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's single global DEVICE lazy_static
(reference src/lib.rs:22-30): instead of picking one accelerator, we build a
``jax.sharding.Mesh`` over all addressable devices with a ``data`` axis (the
self-play game batch / training batch axis) and a ``model`` axis (kept for
future tensor parallelism; the reference ResNet is small and is replicated,
SURVEY.md section 2 parallelism table).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh.  data=-1 means "all devices / model"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover the {n} available devices"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (game/batch) axis over the data axis, replicate rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, small scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every leaf of a pytree with its leading axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def compute_dtype():
    """Inference-path compute dtype policy (reference uses f32 everywhere,
    DEFAULT_TYPE src/lib.rs:20).

    Default f32: measured on the real chip (BASELINE.md round 2), explicit
    bf16 makes the 256x19 ResNet search SLOWER (46.5k vs 49.6k sims/s at
    B=1024) because XLA already routes f32 convs through bf16 MXU passes
    with f32 accumulation, so the explicit-bf16 graph only adds casts.
    Set DIE_E_BF16=1 to opt in (worth re-measuring for larger nets)."""
    import os

    import jax.numpy as jnp

    if os.environ.get("DIE_E_BF16", "0") == "1" and \
            jax.default_backend() == "tpu":
        return jnp.bfloat16
    return jnp.float32
