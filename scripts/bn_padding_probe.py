"""BN-padding distortion probe against a REAL late-run checkpoint.

DIVERGENCES row 17: the on-device epoch pads the final partial batch with
wrapped zero-weight rows, which still enter BatchNorm batch statistics
(the reference trains on the natural-size final batch,
alphazero.rs:205-259).  tests/test_train.py bounds the effect on a fresh
64-filter net with random targets; VERDICT round-4 item 8 asks for the
same probe against a real late-run checkpoint with real self-play rows
once iter >= 30 exists.  This script is that probe:

identical Adam step sequences from the restored checkpoint — except the
final batch either carries B/2 real + B/2 wrapped zero-weight rows
(padded arm) or just the B/2 real rows (natural arm) — then compares
batch_stats / params / eval-loss on a held-out batch of real rows.

Usage:
    python scripts/bn_padding_probe.py --cpu \
        --model-path runs/bg_full/models/backgammon/model_30 \
        --memory runs/bg_full/data/backgammon/run-*/lrn-30/sp-0/memory.npz
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")  # sitecustomize override

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--memory", required=True,
                    help="memory.npz path (glob ok) with real rows")
    ap.add_argument("--steps", type=int, default=3,
                    help="full batches before the padded/natural final one")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.00025,
                    help="the run's current lr (configs/bg_full.toml)")
    ap.add_argument("--wd", type=float, default=0.0001)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from die_e_tpu.envs import backgammon as bg
    from die_e_tpu.nets.resnet import init_params, make_net
    from die_e_tpu.train import checkpoint as ckpt
    from die_e_tpu.train.learner import (
        TrainState, make_optimizer, train_step)

    net = make_net(bg.SPEC)
    template = init_params(net, jax.random.PRNGKey(0))
    variables = ckpt.restore_variables(args.model_path, template)
    tx = make_optimizer(args.lr, args.wd)

    mem_path = sorted(glob.glob(args.memory))[-1]
    z = np.load(mem_path)
    B, half = args.batch, args.batch // 2
    need = args.steps * B + half + B  # train rows + held-out probe batch
    obs = jnp.asarray(z["states"][:need])
    ps = jnp.asarray(z["ps"][:need])
    outcome = jnp.asarray(z["outcomes"][:need])
    assert obs.shape[0] == need, f"memory too small: {obs.shape[0]} < {need}"

    def run(pad_last: bool) -> TrainState:
        # train_step DONATES its TrainState (CLAUDE.md invariant), so each
        # arm gets its own buffer copies of the restored checkpoint
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        state = TrainState(
            params=params,
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        for i in range(args.steps):
            sl = slice(B * i, B * (i + 1))
            state, _ = train_step(
                net, tx, state, obs[sl], ps[sl], outcome[sl],
                jnp.ones((B,)))
        lo = args.steps * B
        if pad_last:  # half real + half wrapped rows at weight 0
            idx = jnp.concatenate(
                [jnp.arange(lo, lo + half), jnp.arange(0, half)])
            w = jnp.concatenate([jnp.ones((half,)), jnp.zeros((half,))])
            state, _ = train_step(
                net, tx, state, obs[idx], ps[idx], outcome[idx], w)
        else:  # natural-size final batch (reference semantics)
            sl = slice(lo, lo + half)
            state, _ = train_step(
                net, tx, state, obs[sl], ps[sl], outcome[sl],
                jnp.ones((half,)))
        return state

    s_pad, s_nat = run(True), run(False)

    def flat(tree):
        return np.concatenate([
            np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)])

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))

    # eval-mode loss on held-out REAL rows under both models
    sl = slice(args.steps * B + half, args.steps * B + half + B)

    def eval_loss(state):
        policy, value = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            obs[sl], train=False)
        ce = -jnp.mean(jnp.sum(
            ps[sl] * jax.nn.log_softmax(policy, axis=-1), axis=-1))
        mse = jnp.mean((value.squeeze(-1) - outcome[sl]) ** 2)
        return float(ce + mse)

    l_pad, l_nat = eval_loss(s_pad), eval_loss(s_nat)
    print(json.dumps({
        "metric": "bn_padding_probe", "model": args.model_path,
        "memory": mem_path, "steps": args.steps, "batch": B,
        "rel_batch_stats_delta": rel(flat(s_pad.batch_stats),
                                     flat(s_nat.batch_stats)),
        "rel_params_delta": rel(flat(s_pad.params), flat(s_nat.params)),
        "eval_loss_padded": l_pad, "eval_loss_natural": l_nat,
        "eval_loss_rel_delta": abs(l_pad - l_nat) / max(abs(l_nat), 1e-9),
    }), flush=True)


if __name__ == "__main__":
    main()
