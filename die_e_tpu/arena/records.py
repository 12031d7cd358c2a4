"""JSON game records + replay.

Rebuilds the reference's game store (reference src/versus.rs:17-122):
``Game { id, player1, player2, turns: [Turn { roll, action, player }],
winner, initial_state }`` saved as one JSON per game, plus load / load_all
and an interactive replay printer.

Documented divergence (quirk consciously fixed, SURVEY.md section 7): the
replay actually re-applies each turn's action to the board; the reference's
print_game shows the initial board for every turn (versus.rs:91-93).
"""

from __future__ import annotations

import dataclasses
import json
import uuid
from pathlib import Path
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Turn:
    """versus.rs:22-27."""

    roll: Optional[list]
    action: int
    player: str  # agent kind string

    def to_json(self):
        return {"roll": self.roll, "action": self.action, "player": self.player}

    @staticmethod
    def from_json(d):
        return Turn(roll=d["roll"], action=d["action"], player=d["player"])


@dataclasses.dataclass
class GameRecord:
    """versus.rs:28-52."""

    id: str
    player1: str
    player2: str
    turns: List[Turn]
    winner: str
    initial_state: dict  # env-specific state snapshot (arrays as lists)
    game: str = ""

    def to_json(self):
        return {
            "id": self.id,
            "game": self.game,
            "player1": self.player1,
            "player2": self.player2,
            "turns": [t.to_json() for t in self.turns],
            "winner": self.winner,
            "initial_state": self.initial_state,
        }

    @staticmethod
    def from_json(d):
        return GameRecord(
            id=d["id"],
            game=d.get("game", ""),
            player1=d["player1"],
            player2=d["player2"],
            turns=[Turn.from_json(t) for t in d["turns"]],
            winner=d["winner"],
            initial_state=d["initial_state"],
        )

    @staticmethod
    def from_arrays(env, p1_kind, p2_kind, init_states, turns_log, winner):
        """Build per-game records from the arena's host-side round log."""
        n = len(winner)
        state_fields = {
            f.name: np.asarray(getattr(init_states, f.name))
            for f in dataclasses.fields(init_states)
        }
        records = []
        for g in range(n):
            turns = []
            for player_sign, action, roll in turns_log:
                if action[g] < 0:
                    continue  # game already finished this round
                kind = p1_kind.value if player_sign[g] == -1 else p2_kind.value
                roll_g = roll[g].tolist() if roll is not None else None
                turns.append(Turn(roll=roll_g, action=int(action[g]), player=kind))
            w = int(winner[g])
            winner_kind = (
                p1_kind.value if w == -1 else p2_kind.value if w == 1 else "none"
            )
            init = {
                k: np.asarray(v[g]).tolist() for k, v in state_fields.items()
            }
            records.append(
                GameRecord(
                    id=uuid.uuid4().hex[:21],  # nanoid-length id (versus.rs:44)
                    game=env.spec.name,
                    player1=p1_kind.value,
                    player2=p2_kind.value,
                    turns=turns,
                    winner=winner_kind,
                    initial_state=init,
                )
            )
        return records


def save_game(record: GameRecord, game_path) -> Path:
    """versus.rs:54-63: {id}.json under game_path."""
    path = Path(game_path)
    path.mkdir(parents=True, exist_ok=True)
    out = path / f"{record.id}.json"
    out.write_text(json.dumps(record.to_json(), indent=2))
    return out


def load_game(path) -> GameRecord:
    """versus.rs:65-73."""
    return GameRecord.from_json(json.loads(Path(path).read_text()))


def load_all_games(path) -> List[GameRecord]:
    """versus.rs:107-122."""
    return [
        load_game(p) for p in sorted(Path(path).iterdir())
        if p.is_file() and p.suffix == ".json"
    ]


def _state_from_record(env, record: GameRecord):
    import jax.numpy as jnp

    state_cls = type(env.init(jnp.uint32(0)))
    fields = {
        k: jnp.asarray(v) for k, v in record.initial_state.items()
    }
    return state_cls(**fields)


def replay_game(env, path, pretty_str, wait_user_input: bool = False,
                out=print) -> None:
    """Interactive replay (print_game, versus.rs:75-105) that RE-APPLIES
    every action (reference bug fixed: versus.rs:91-93 never updates the
    board)."""
    import jax

    record = load_game(path)
    out(f"Game ID: {record.id}")
    out(f"Player 1: {record.player1}, Player 2: {record.player2}")
    out(f"Game winner: {record.winner}")
    state = _state_from_record(env, record)
    out("Initial State:")
    out(pretty_str(state))
    step_fn = jax.jit(env.step)  # one wrapper for every turn, traced once
    for turn in record.turns:
        out(f"Player: {turn.player}")
        out(f"Roll: {turn.roll}")
        out(f"Action: {turn.action}")
        state = step_fn(state, turn.action)
        out("State after action has been played:")
        out(pretty_str(state))
        if wait_user_input:
            input("Press Enter to continue...")
