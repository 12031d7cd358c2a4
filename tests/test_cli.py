"""CLI tests (reference src/main.rs:15-79 command surface), including an
end-to-end drive of every subcommand body (reference main.rs:119-216) on a
tiny TicTacToe config in a tmp working dir."""

import json

import pytest

from die_e_tpu.cli.main import build_parser, main


def test_four_subcommands_exist():
    p = build_parser()
    for argv in (
        ["learn"],
        ["play", "-1", "random", "-2", "mcts"],
        ["train"],
        ["replay", "some/game.json"],
    ):
        args = p.parse_args(argv)
        assert args.command == argv[0]


def test_global_flags():
    p = build_parser()
    args = p.parse_args(
        ["-c", "cfg.toml", "-g", "tictactoe", "--mesh-data", "4",
         "--seed", "3", "learn", "-m", "model/path"]
    )
    assert args.config == "cfg.toml"
    assert args.game == "tictactoe"
    assert args.mesh_data == 4
    assert args.seed == 3
    assert args.model_path == "model/path"


def test_invalid_game_rejected(capsys):
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["-g", "chess", "learn"])


def test_train_data_path_flags():
    """main.rs:62-74: run-id / learn / self-play selectors."""
    p = build_parser()
    args = p.parse_args(["train", "-r", "abc", "-l", "2", "-s", "1"])
    assert args.run_id == "abc"
    assert args.learn_idx == "2"
    assert args.sp_idx == "1"


def test_play_agents_and_output():
    p = build_parser()
    args = p.parse_args(
        ["play", "-1", "model", "-2", "random", "--model1-path", "m1",
         "-o", "out/", "--num-games", "10"]
    )
    assert args.agent_one == "model"
    assert args.model1_path == "m1"
    assert args.output_path == "out/"
    assert args.num_games == 10


TINY_TOML = """
temperature = 1.25
learn_iterations = 1
self_play_iterations = 1
num_epochs = 1
training_batch_size = 16
num_self_play_batches = 16
iterations = 8
exploration_const = 2
simulate_round_limit = 9
dirichlet_alpha = 0.3
dirichlet_epsilon = 0.25
wd = 0.0001
lr = 0.001
arena_num_games = 8
arena_round_limit = 9
"""


def test_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """Drive every subcommand BODY (not just the parser) through main():
    learn (scratch) -> learn (best-model bootstrap + real arena gate) ->
    train (offline from ./data) -> play with game records -> replay that
    re-applies moves (reference main.rs:119-216; the reference's replay
    never re-applies, versus.rs:91-93 — ours must)."""
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(TINY_TOML)
    monkeypatch.chdir(tmp_path)  # CLI writes ./data and ./models

    base = ["-c", str(cfg), "-g", "tictactoe",
            "--metrics-jsonl", str(tmp_path / "m.jsonl")]
    assert main(base + ["learn"]) == 0
    assert (tmp_path / "models" / "tictactoe" / "model_0").exists()
    assert (tmp_path / "models" / "tictactoe" / "best").exists()

    # 2nd learn (fresh run): bootstraps from best and runs a REAL arena
    # gate against it
    assert main(base + ["learn"]) == 0
    events = [json.loads(l) for l in
              (tmp_path / "m.jsonl").read_text().splitlines()]
    gates = [e for e in events if e["event"] == "gate"]
    assert gates[0]["result"] == "no_best_promoted"
    assert gates[1]["result"] in (
        "promoted", "best_kept", "inconclusive_kept"
    )
    assert "winrate" in gates[1]
    boots = [e for e in events if e["event"] == "model_bootstrap"]
    assert boots[0]["source"] == "scratch"
    assert boots[1]["source"].endswith("best")

    # offline train from the self-play data written by learn
    assert main(base + ["train"]) == 0
    assert (tmp_path / "models" / "tictactoe" / "trained_model").exists()

    # play with JSON game records
    out = tmp_path / "games"
    assert main(base + ["play", "-1", "mcts", "-2", "random",
                        "-o", str(out), "--num-games", "4"]) == 0
    recs = list(out.glob("*.json"))
    assert len(recs) == 4
    captured = capsys.readouterr()
    assert "Winrate" in captured.out

    # replay re-applies every move (board must evolve in the output)
    assert main(["-g", "tictactoe", "replay", str(recs[0]),
                 "--no-wait"]) == 0
    captured = capsys.readouterr()
    assert "State after action" in captured.out
    rec = json.loads(recs[0].read_text())
    assert captured.out.count("Action:") == len(rec["turns"])
