"""Orbax checkpointing of model + optimizer state.

Replaces the reference's VarStore::save/load of .ot files
(reference src/alphazero/alpha_parallel.rs:85-95, alpha_versus.rs:17-26,
alphazero.rs:86-100).  Unlike the reference, optimizer state IS checkpointed
(the reference rebuilds Adam fresh every run, alphazero.rs:102 — SURVEY.md
section 5 checkpoint/resume).

Layout mirrors the reference's model directory convention:
``models/{game}/model_{i}`` per learn iteration and ``models/{game}/best``
maintained by gating.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from die_e_tpu.train.learner import TrainState


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_state(state: TrainState, path) -> None:
    path = Path(path).absolute()
    _ckptr().save(path, jax.device_get(state), force=True)


def restore_state(path, template: TrainState) -> TrainState:
    path = Path(path).absolute()
    restored = _ckptr().restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(jax.numpy.asarray, restored)


def save_variables(variables, path) -> None:
    """Inference-only save: {params, batch_stats}."""
    path = Path(path).absolute()
    _ckptr().save(path, jax.device_get(variables), force=True)


def restore_variables(path, template) -> dict:
    path = Path(path).absolute()
    restored = _ckptr().restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(jax.numpy.asarray, restored)


def model_dir(game_name: str, base: str = "./models") -> Path:
    return Path(base) / game_name


def best_model_path(game_name: str, base: str = "./models") -> Path:
    """reference ./models/{game}/best_model.ot (alpha_versus.rs:19)."""
    return model_dir(game_name, base) / "best"


def bootstrap_variables(net, rng, game_name: str,
                        explicit_path: Optional[str] = None,
                        base: str = "./models"):
    """Model bootstrap order: explicit path > best model > scratch
    (reference alphazero.rs:86-100).  Returns (variables, source_str)."""
    from die_e_tpu.nets.resnet import init_params

    template = init_params(net, rng)
    if explicit_path is not None:
        return restore_variables(explicit_path, template), str(explicit_path)
    best = best_model_path(game_name, base)
    if best.exists():
        return restore_variables(best, template), str(best)
    return template, "scratch"
