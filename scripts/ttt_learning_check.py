"""BASELINE.json config 2 exit check: the TicTacToe AlphaZero learn loop
must reach >95% non-loss vs the random agent (SURVEY.md section 7 stage 4).

Trains for a few learn iterations with a small search budget, then
evaluates the resulting model against Random over a full arena
(model = player 1 / side -1; non-loss = wins + draws).

Usage:  python scripts/ttt_learning_check.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import jax

if os.environ.get("DIE_E_PLATFORM"):
    # env JAX_PLATFORMS can be overridden by a sitecustomize-registered
    # PJRT plugin; the config update after import wins
    jax.config.update("jax_platforms", os.environ["DIE_E_PLATFORM"])

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from die_e_tpu.arena.versus import Agent, Player, play
from die_e_tpu.core.config import (
    AlphaZeroConfig,
    ArenaConfig,
    Config,
    MctsConfig,
    OptimizerParams,
)
from die_e_tpu.core.metrics import Metrics
from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.train.learn import learn
from die_e_tpu.train.learner import net_eval_fn


def main(workdir: str):
    config = Config(
        mcts=MctsConfig(iterations=64, simulate_round_limit=9, negamax=True),
        alphazero=AlphaZeroConfig(
            temperature=1.25,
            learn_iterations=24,
            self_play_iterations=2,
            num_epochs=2,
            training_batch_size=256,
            num_self_play_batches=256,
        ),
        optimizer=OptimizerParams(),
        arena=ArenaConfig(num_games=128, round_limit=9),
    )
    metrics = Metrics()
    work = Path(workdir)
    state = learn(
        ttt.ENV, config, seed=0,
        data_base=str(work / "data"), models_base=str(work / "models"),
        metrics=metrics,
    )

    net = make_net(ttt.SPEC)
    eval_fn = net_eval_fn(net)
    result = play(
        ttt.ENV, eval_fn, Player(Agent.MODEL, state.variables),
        Player(Agent.RANDOM), jax.random.PRNGKey(123),
        config.mcts, temperature=0.25, num_games=400, round_limit=9,
        metrics=metrics,
    )
    non_loss = (result.wins_p1 + result.draws) / result.n_games
    print(result)
    print(f"NON-LOSS RATE vs random: {non_loss:.3f} (target > 0.95)")
    return 0 if non_loss > 0.95 else 1


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ttt_az_")
    sys.exit(main(wd))
