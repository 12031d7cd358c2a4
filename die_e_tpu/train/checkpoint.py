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

import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from die_e_tpu.train.learner import TrainState


def _ckptr():
    # Process-LOCAL checkpointer.  Orbax's default Checkpointer wraps
    # save/restore in a GLOBAL process barrier, which deadlocks — or worse,
    # collides with unrelated in-flight collectives (observed as a gloo
    # "Received data size doesn't match expected size" abort) — whenever
    # only a subset of a multi-process run checkpoints: the gate and the
    # learn loop's saver run on process 0 only.  Every tree here is plain
    # host numpy (device_get before save), so reads and writes need no
    # cross-process coordination at all; scoping the barrier to this
    # process alone makes save/restore safe from any process at any time.
    i = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=i, active_processes={i},
            barrier_sync_key_prefix=f"p{i}"),
    )


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


class AsyncSaver:
    """Background-thread checkpoint writer (SURVEY.md §5: "Orbax async
    checkpointing" — the reference has no async story at all, its saves
    block the learn loop, alpha_parallel.rs:85-95).

    One worker thread, saves serialized in submission order.  The caller
    MUST call :meth:`wait` before any operation that invalidates the
    arrays being saved — in practice before the next ``train_epoch``,
    whose ``train_step`` donates the TrainState buffers — and before
    process exit / restoring a path with a pending save.  ``wait`` also
    re-raises any exception from the background save.

    ``on_committed`` callbacks run in the worker thread strictly AFTER the
    checkpoint is durably written (orbax writes are atomic: tmp dir +
    rename), which is what makes the learn loop's resume cursor
    crash-consistent: the cursor only ever points at a committed state.
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-saver")
        self._pending = None

    def submit(self, fn: Callable[[], None]) -> None:
        """Queue ``fn`` on the saver thread (after any pending save)."""
        self.wait()
        self._pending = self._executor.submit(fn)

    def save_state(self, state: TrainState, path,
                   on_committed: Optional[Callable[[], None]] = None,
                   extra_variables_path=None) -> None:
        """Asynchronously save the full train state to ``path`` (and, if
        given, its inference variables to ``extra_variables_path`` from
        the same single device fetch), then run ``on_committed``."""
        # Hint the device→host copies to start now so the worker's
        # device_get mostly finds data already on host.
        for leaf in jax.tree_util.tree_leaves(state):
            copy_async = getattr(leaf, "copy_to_host_async", None)
            if copy_async is not None:
                copy_async()

        def task():
            host_state = jax.device_get(state)
            if extra_variables_path is not None:
                _ckptr().save(Path(extra_variables_path).absolute(),
                              host_state.variables, force=True)
            # Never overwrite the resume target in place: a SIGTERM/SIGKILL
            # mid-save (watchdog stall-kill, pause_run.sh) must leave EITHER
            # the previous committed state at `path` OR a complete new state
            # at `path.new` — observed failure mode: orbax force=True tears
            # down the old dir before the new write is durable, so an
            # in-place overwrite can destroy the only full train state on
            # disk (round-4 torn latest_state).  resolve_state_dir() is the
            # reader-side half of this protocol.
            target = Path(path).absolute()
            new = target.with_name(target.name + ".new")
            old = target.with_name(target.name + ".old")
            _ckptr().save(new, host_state, force=True)
            shutil.rmtree(old, ignore_errors=True)
            if target.exists():
                target.rename(old)
            new.rename(target)
            shutil.rmtree(old, ignore_errors=True)
            if on_committed is not None:
                on_committed()

        self.submit(task)

    def wait(self) -> None:
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self) -> None:
        self.wait()
        self._executor.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def resolve_state_dir(path, heal: bool = True) -> Optional[Path]:
    """Reader-side half of AsyncSaver.save_state's atomic swap: return the
    directory holding the newest complete full-state checkpoint for
    ``path``, healing interrupted swaps.

    A kill can land (a) mid-write to ``path.new`` — ``path`` still holds
    the previous committed state; (b) between the two renames — ``path`` is
    gone but ``path.new`` is complete (the swap only starts after the save
    returns); (c) after the swap — ``path`` holds the new state.  Prefers
    ``path``, then heals ``path.new`` / ``path.old`` into place.  Returns
    None when no candidate exists.  Restore errors are still possible for
    legacy in-place saves torn before this protocol existed — callers
    should treat a failed restore as "fall back", not fatal.

    ``heal=False`` is strictly read-only: it returns the best candidate
    (``path`` > ``path.new`` > ``path.old``) without touching the
    filesystem.  Multi-process resumes must pass it on every process except
    the one designated to heal — the shared models dir invariant is "every
    host reads, only process 0 writes", and two processes racing the
    ``cand.rename(target)`` heal would crash the loser with OSError.
    """
    target = Path(path)
    new = target.with_name(target.name + ".new")
    old = target.with_name(target.name + ".old")
    if target.exists():
        if heal:
            # stale swap leftovers: .new is an unfinished (unrenamed) save,
            # .old a superseded state — both are strictly older than `target`
            shutil.rmtree(new, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
        return target
    for cand in (new, old):  # .new is the more recent complete state
        if cand.exists():
            if not heal:
                return cand
            try:
                cand.rename(target)
            except OSError:
                # lost a heal race (another process renamed first): the
                # target is now in place — fall through to re-check it
                if target.exists():
                    return target
                raise
            shutil.rmtree(new, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            return target
    return None


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
