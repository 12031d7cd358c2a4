"""Bulk seeded trajectory parity: N full games, JAX env vs the C++ oracle.

Both sides play the oracle's deterministic policy (k-th legal action with k
from the salted seed stream) from the same per-game seeds.  The JAX side
runs all games in one fused lockstep loop on the accelerator and returns a
rolling hash of each game's action sequence plus the winner and move count;
the host side replays every game through the C++ oracle and compares.

Equal action-sequence hashes + winners + lengths over thousands of games is
the BASELINE "seeded trajectory parity: exact" evidence at scale
(BASELINE.json config 3; per-step state equality is covered by
tests/test_trajectory_parity.py).

Usage:  python scripts/parity_sweep.py [n_games] [max_steps]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("DIE_E_SWEEP_TPU", "0") != "1":
    # the parity sweep is a CPU-vs-C++-oracle check; keep it off the real
    # chip (a sitecustomize PJRT plugin overrides JAX_PLATFORMS, so the
    # config update after import is the only reliable way to force CPU)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from die_e_tpu.envs import backgammon as bg
from parity import oracle as cpp


def _mix_np(x):
    x = np.uint32(x)
    x ^= x >> np.uint32(16)
    x = np.uint32((int(x) * 0x85EBCA6B) & 0xFFFFFFFF)
    x ^= x >> np.uint32(13)
    x = np.uint32((int(x) * 0xC2B2AE35) & 0xFFFFFFFF)
    x ^= x >> np.uint32(16)
    return x


@partial(jax.jit, static_argnames=("max_steps",))
def jax_side(seeds, max_steps: int):
    states = jax.vmap(bg.init)(seeds)
    b = seeds.shape[0]
    done0 = jax.vmap(bg.ENV.done)(states)

    def cond(carry):
        _, done, t, _, _ = carry
        return (t < max_steps) & ~jnp.all(done)

    def body(carry):
        states, done, t, h, moves = carry
        legal = jax.vmap(bg.legal_mask)(states)
        n_legal = jnp.sum(legal, axis=-1)
        # oracle action rule: k-th legal, k from the salted stream
        k = bg._mix32(
            seeds ^ bg._mix32(jnp.uint32(0xACC10000) + t.astype(jnp.uint32))
        ) % jnp.maximum(n_legal, 1).astype(jnp.uint32)
        pos = jnp.cumsum(legal, axis=-1) - 1
        pick = legal & (pos == k[:, None].astype(jnp.int32))
        action = jnp.argmax(pick, axis=-1).astype(jnp.int32)

        h = jnp.where(
            done, h,
            bg._mix32(h ^ (t.astype(jnp.uint32) * jnp.uint32(1353)
                           + action.astype(jnp.uint32))),
        )
        moves = moves + (~done).astype(jnp.int32)
        next_states = jax.vmap(bg.step)(states, action)
        from die_e_tpu.envs.base import freeze_where

        states = freeze_where(done, states, next_states)
        done = done | jax.vmap(bg.ENV.done)(states)
        return states, done, t + 1, h, moves

    states, done, _, h, moves = jax.lax.while_loop(
        cond, body,
        (states, done0, jnp.int32(0), jnp.zeros(b, jnp.uint32),
         jnp.zeros(b, jnp.int32)),
    )
    winner = jnp.where(done, jax.vmap(bg.winner)(states), 0)
    return h, winner, moves


def main(n_games: int, max_steps: int):
    seeds = np.arange(1, n_games + 1, dtype=np.uint32) * np.uint32(2654435761)
    t0 = time.perf_counter()
    h_j, w_j, m_j = map(np.asarray, jax_side(jnp.asarray(seeds), max_steps))
    t_jax = time.perf_counter() - t0

    t0 = time.perf_counter()
    mismatches = 0
    finished = 0
    for i, seed in enumerate(seeds):
        traj = cpp.run_trajectory(int(seed), max_steps=max_steps)
        n = traj["n"]
        h = np.uint32(0)
        moves = 0
        winner = 0
        for t in range(n):
            a = int(traj["actions"][t])
            if a < 0:
                winner = int(traj["winners"][t]) if "winners" in traj else 0
                break
            h = _mix_np(np.uint32(int(h) ^ (t * 1353 + a)))
            moves += 1
        else:
            winner = 0
        if winner == 0 and n > 0 and int(traj["actions"][n - 1]) < 0:
            pass
        # winner from the oracle's final recorded state
        fb, fbar, foff = traj["boards"][n - 1], traj["bars"][n - 1], traj["offs"][n - 1]
        if foff[0] == 15:
            winner = -1
        elif foff[1] == 15:
            winner = 1
        else:
            winner = 0
        if winner != 0:
            finished += 1
        ok = (h == h_j[i]) and (winner == w_j[i]) and (moves == m_j[i])
        if not ok:
            mismatches += 1
            if mismatches <= 5:
                print(f"MISMATCH game {i} seed {seed}: "
                      f"hash {h:#x} vs {h_j[i]:#x}, winner {winner} vs "
                      f"{w_j[i]}, moves {moves} vs {m_j[i]}")
    t_oracle = time.perf_counter() - t0

    print(f"games={n_games} max_steps={max_steps} finished={finished} "
          f"mismatches={mismatches} "
          f"(jax {t_jax:.1f}s, oracle {t_oracle:.1f}s)")
    return 1 if mismatches else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ms = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    sys.exit(main(n, ms))
