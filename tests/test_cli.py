"""CLI tests (reference src/main.rs:15-79 command surface)."""

import pytest

from die_e_tpu.cli.main import build_parser


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
