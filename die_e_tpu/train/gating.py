"""Model gating: candidate vs current best.

Rebuilds the reference's play_vs_best_model / play_vs_model
(reference src/alphazero/alpha_versus.rs:16-82): if no best model exists the
candidate is promoted immediately (:19-26); otherwise a full arena match is
played (candidate as player 1 / side -1) and the candidate is promoted at
winrate >= 0.55, the best kept at <= 0.45, and kept on inconclusive results
in between (:74-77 via play_vs_model :59-81).
"""

from __future__ import annotations

from typing import Optional

import jax

from die_e_tpu.arena.versus import Agent, Player, play
from die_e_tpu.train import checkpoint as ckpt


def gate(
    env,
    eval_fn,
    candidate_variables,
    rng,
    mcts_cfg,
    arena_cfg,
    temperature: float,
    models_base: str = "./models",
    metrics=None,
) -> bool:
    """Run the gate; promotes (writes the ``best`` checkpoint) and returns
    True iff the candidate became the new best."""
    best_path = ckpt.best_model_path(env.spec.name, models_base)
    if not best_path.exists():
        if metrics is not None:
            metrics.log("gate", result="no_best_promoted")
        ckpt.save_variables(candidate_variables, best_path)
        return True

    best_variables = ckpt.restore_variables(best_path, candidate_variables)
    result = play(
        env,
        eval_fn,
        Player(Agent.MODEL, candidate_variables),
        Player(Agent.MODEL, best_variables),
        rng,
        mcts_cfg,
        temperature=temperature,
        num_games=arena_cfg.num_games,
        round_limit=arena_cfg.round_limit,
        metrics=metrics,
    )
    promoted = result.winrate >= arena_cfg.promote_threshold
    if metrics is not None:
        metrics.log(
            "gate",
            winrate=result.winrate,
            wins_p1=result.wins_p1,
            wins_p2=result.wins_p2,
            draws=result.draws,
            result="promoted" if promoted
            else ("best_kept" if result.winrate <= arena_cfg.keep_threshold
                  else "inconclusive_kept"),
        )
    if promoted:
        ckpt.save_variables(candidate_variables, best_path)
    return promoted
