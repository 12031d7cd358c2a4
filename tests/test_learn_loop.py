"""End-to-end learn-loop test on the 8-device virtual mesh: the CLI-level
learn() with multiple devices takes the sharded self-play path (game batch
over the data axis, replicated params)."""

import jax
import numpy as np
import pytest

from die_e_tpu.core.config import (
    AlphaZeroConfig,
    ArenaConfig,
    Config,
    MctsConfig,
    MeshConfig,
    OptimizerParams,
)
from die_e_tpu.core.metrics import Metrics
from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.train.learn import learn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_learn_uses_mesh_and_produces_artifacts(tmp_path):
    config = Config(
        mcts=MctsConfig(iterations=8, simulate_round_limit=9),
        alphazero=AlphaZeroConfig(
            learn_iterations=1, self_play_iterations=1, num_epochs=1,
            training_batch_size=16, num_self_play_batches=16,
        ),
        optimizer=OptimizerParams(),
        mesh=MeshConfig(data=8, model=1),
        arena=ArenaConfig(num_games=8, round_limit=9),
    )
    metrics = Metrics(quiet=True)
    state = learn(
        ttt.ENV, config, seed=0,
        data_base=str(tmp_path / "data"), models_base=str(tmp_path / "models"),
        metrics=metrics,
    )
    # artifacts: sp data, per-iteration model, best model from the gate
    runs = list((tmp_path / "data" / "tictactoe").iterdir())
    assert len(runs) == 1
    assert (runs[0] / "lrn-0" / "sp-0" / "memory.npz").exists()
    assert (tmp_path / "models" / "tictactoe" / "model_0").exists()
    assert (tmp_path / "models" / "tictactoe" / "best").exists()
    # params finite
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_resume_continues_iteration_numbering(tmp_path):
    """A killed run resumed with --resume continues the same run id and
    learn-iteration numbering via models/{game}/latest_meta.json."""
    import json

    def cfg(total_iters):
        return Config(
            mcts=MctsConfig(iterations=4, simulate_round_limit=9),
            alphazero=AlphaZeroConfig(
                learn_iterations=total_iters, self_play_iterations=1,
                num_epochs=1, training_batch_size=8,
                num_self_play_batches=8,
            ),
            optimizer=OptimizerParams(),
            mesh=MeshConfig(data=8, model=1),
            arena=ArenaConfig(num_games=8, round_limit=9),
        )

    kw = dict(data_base=str(tmp_path / "data"),
              models_base=str(tmp_path / "models"),
              metrics=Metrics(quiet=True))
    learn(ttt.ENV, cfg(total_iters=1), seed=0, **kw)
    meta = json.loads(
        (tmp_path / "models" / "tictactoe" / "latest_meta.json").read_text()
    )
    assert meta["next_learn_iter"] == 1

    # resume with a higher total: continues as lrn-1 in the SAME run dir
    learn(ttt.ENV, cfg(total_iters=2), seed=0, resume=True, **kw)
    runs = list((tmp_path / "data" / "tictactoe").iterdir())
    assert len(runs) == 1
    assert (runs[0] / "lrn-0" / "sp-0" / "memory.npz").exists()
    assert (runs[0] / "lrn-1" / "sp-0" / "memory.npz").exists()
    assert (tmp_path / "models" / "tictactoe" / "model_1").exists()
    meta = json.loads(
        (tmp_path / "models" / "tictactoe" / "latest_meta.json").read_text()
    )
    assert meta["next_learn_iter"] == 2
    assert meta["run_id"] == runs[0].name.removeprefix("run-")
    # a cleanly finished iteration leaves no pending gate in the cursor
    assert "pending_gate" not in meta


def test_resume_reruns_gate_interrupted_mid_arena(tmp_path):
    """The cursor commits pending_gate=i with the model_{i} checkpoint and
    clears it only after the gate finishes; a resume that finds it pending
    (crash during the gating arena) re-runs that gate instead of silently
    skipping it."""
    import json

    config = Config(
        mcts=MctsConfig(iterations=4, simulate_round_limit=9),
        alphazero=AlphaZeroConfig(
            learn_iterations=1, self_play_iterations=1, num_epochs=1,
            training_batch_size=8, num_self_play_batches=8,
        ),
        optimizer=OptimizerParams(),
        mesh=MeshConfig(data=8, model=1),
        arena=ArenaConfig(num_games=8, round_limit=9),
    )
    kw = dict(data_base=str(tmp_path / "data"),
              models_base=str(tmp_path / "models"))
    learn(ttt.ENV, config, seed=0, metrics=Metrics(quiet=True), **kw)

    # simulate a crash between the model_0 commit and the end of its gate:
    # rewrite the cursor to the state the async commit leaves behind
    meta_path = tmp_path / "models" / "tictactoe" / "latest_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["pending_gate"] = 0
    meta_path.write_text(json.dumps(meta))

    jsonl = tmp_path / "events.jsonl"
    learn(ttt.ENV, config, seed=0, resume=True,
          metrics=Metrics(quiet=True, jsonl_path=str(jsonl)), **kw)
    events = [json.loads(l) for l in jsonl.read_text().splitlines()]
    names = [e["event"] for e in events]
    assert "gate_resume" in names
    # the catch-up gate itself ran and emitted its verdict
    assert names.index("gate_resume") < names.index("gate")
    # cursor cleared: no pending gate, numbering unchanged
    meta = json.loads(meta_path.read_text())
    assert meta["next_learn_iter"] == 1
    assert "pending_gate" not in meta
