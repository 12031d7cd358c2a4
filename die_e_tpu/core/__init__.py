from die_e_tpu.core.config import (
    AlphaZeroConfig,
    ArenaConfig,
    Config,
    MctsConfig,
    MeshConfig,
    OptimizerParams,
    load_config,
)
from die_e_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from die_e_tpu.core.metrics import Metrics, Timer
from die_e_tpu.core.prng import fold_in_all, per_game_seeds

__all__ = [
    "AlphaZeroConfig",
    "ArenaConfig",
    "Config",
    "MctsConfig",
    "MeshConfig",
    "OptimizerParams",
    "load_config",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "Metrics",
    "Timer",
    "fold_in_all",
    "per_game_seeds",
]
