"""BASELINE.json config 4 scaled-down demo: backgammon AlphaZero self-play +
train on one chip, then evaluate the trained model against Random and
pure-MCTS agents.

The full reference workload (100 learn iters x 4 sp x 1024 games x 100
sims) is a multi-day run; this demo runs the identical pipeline at reduced
scale to demonstrate end-to-end learning on the flagship game.

Usage:  python scripts/bg_learning_demo.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import jax

if os.environ.get("DIE_E_PLATFORM"):
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
from die_e_tpu.envs import backgammon as bg
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.train.learn import learn
from die_e_tpu.train.learner import net_eval_fn


def main(workdir: str):
    config = Config(
        mcts=MctsConfig(
            iterations=48, simulate_round_limit=160, negamax=True,
        ),
        alphazero=AlphaZeroConfig(
            temperature=1.25,
            learn_iterations=4,
            self_play_iterations=1,
            num_epochs=2,
            training_batch_size=256,
            num_self_play_batches=256,
        ),
        optimizer=OptimizerParams(),
        arena=ArenaConfig(num_games=64, round_limit=160),
    )
    metrics = Metrics()
    work = Path(workdir)
    state = learn(
        bg.ENV, config, seed=0,
        data_base=str(work / "data"), models_base=str(work / "models"),
        metrics=metrics,
    )

    net = make_net(bg.SPEC)
    eval_fn = net_eval_fn(net)
    for opponent in (Agent.RANDOM,):
        result = play(
            bg.ENV, eval_fn, Player(Agent.MODEL, state.variables),
            Player(opponent), jax.random.PRNGKey(321),
            config.mcts, temperature=0.5, num_games=128, round_limit=200,
            metrics=metrics,
        )
        print(f"--- model vs {opponent.value} ---")
        print(result)
    return 0


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="bg_az_")
    sys.exit(main(wd))
