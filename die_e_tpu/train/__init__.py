from die_e_tpu.train.learner import (
    TrainState,
    create_train_state,
    make_optimizer,
    net_eval_fn,
    train_epoch,
    train_step,
)
from die_e_tpu.train.self_play import (
    Trajectory,
    self_play,
    self_play_chunk,
    self_play_hosted,
    trajectory_to_memory,
)
from die_e_tpu.train.replay import Memory, load_training_data, save_training_data

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "net_eval_fn",
    "train_epoch",
    "train_step",
    "Trajectory",
    "self_play",
    "self_play_chunk",
    "self_play_hosted",
    "trajectory_to_memory",
    "Memory",
    "load_training_data",
    "save_training_data",
]
