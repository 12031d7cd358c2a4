"""Config system tests (reference src/lib.rs:33-52, alphazero.rs:24-59,
config-example.toml)."""

import pytest

from die_e_tpu.core.config import Config, load_config


def test_defaults_match_reference_example():
    """config-example.toml:1-19 values are the defaults."""
    c = Config()
    assert c.alphazero.temperature == 1.25
    assert c.alphazero.learn_iterations == 100
    assert c.alphazero.self_play_iterations == 4
    assert c.alphazero.num_epochs == 4
    assert c.alphazero.training_batch_size == 256
    assert c.alphazero.num_self_play_batches == 1024
    assert c.mcts.iterations == 100
    assert c.mcts.c == 2.0
    assert c.mcts.simulate_round_limit == 400
    assert c.mcts.dirichlet_alpha == 0.3
    assert c.mcts.dirichlet_epsilon == 0.25
    assert c.optimizer.wd == 1e-4
    assert c.optimizer.lr == 1e-3
    # hardcoded reference arena constants (versus.rs:168-169,
    # alpha_versus.rs:74-77)
    assert c.arena.num_games == 400
    assert c.arena.round_limit == 400
    assert c.arena.promote_threshold == 0.55
    assert c.arena.keep_threshold == 0.45


def test_flat_toml_keys(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        "temperature = 2.0\niterations = 7\nexploration_const = 1.5\n"
        "lr = 0.01\nmesh_data = 4\narena_num_games = 10\n"
    )
    c = load_config(str(p))
    assert c.alphazero.temperature == 2.0
    assert c.mcts.iterations == 7
    assert c.mcts.c == 1.5
    assert c.optimizer.lr == 0.01
    assert c.mesh.data == 4
    assert c.arena.num_games == 10
    # untouched keys keep defaults
    assert c.alphazero.num_epochs == 4


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text("not_a_key = 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_missing_file_gives_defaults(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert load_config(None) == Config()
