from die_e_tpu.arena.versus import Agent, PlayResult, Player, play
from die_e_tpu.arena.elo import MatchResult, compute_elo, expected_score
from die_e_tpu.arena.records import (
    GameRecord,
    load_all_games,
    load_game,
    replay_game,
    save_game,
)

__all__ = [
    "Agent",
    "MatchResult",
    "compute_elo",
    "expected_score",
    "PlayResult",
    "Player",
    "play",
    "GameRecord",
    "load_all_games",
    "load_game",
    "replay_game",
    "save_game",
]
