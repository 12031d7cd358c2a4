"""Sharded (multi-chip) self-play + training over a device mesh.

The reference has NO multi-device story: one global DEVICE
(reference src/lib.rs:22-30) plus a rayon CPU pool (src/main.rs:107-110);
its only "parallelism" is batched inference over lockstep games
(src/mcts/alpha_mcts.rs:91-202).  This module is the scale-out the TPU
rebuild adds (SURVEY.md section 2 parallelism table):

* **data axis** — the self-play game batch and the training batch are
  sharded over all chips; every per-game env/search/trajectory array
  carries a leading batch axis, so one ``NamedSharding(P("data"))`` on
  the inputs lets XLA partition the entire fused self-play + train step.
* **model axis** — kept in the mesh for a future tensor-parallel net;
  the reference ResNet is small, so parameters are replicated and
  gradients are all-reduced over ICI by XLA when the replicated-out
  sharding is requested (no hand-written collectives needed).
* pipeline / sequence / expert parallelism are N/A for this model family
  (conv net over a 4x6 board, no sequence axis — SURVEY.md section 5)
  and intentionally not implemented.

``train_iteration`` is the single fused step the driver dry-runs: batched
self-play -> flatten trajectory -> one SGD step, all inside one jit over
the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from die_e_tpu.core.mesh import DATA_AXIS, make_mesh
from die_e_tpu.train.learner import TrainState, loss_fn
from die_e_tpu.train.self_play import PROB_QUANT, self_play_from_states

import optax


def make_train_mesh(n_data: int = -1, n_model: int = 1,
                    devices=None) -> Mesh:
    return make_mesh(n_data, n_model, devices)


def shard_trajectory_batch(mesh: Mesh, tree):
    """Place a [B, ...]-leading pytree with B sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


@partial(
    jax.jit,
    static_argnames=(
        "env", "net", "tx", "eval_fn", "iterations", "c",
        "dirichlet_alpha", "dirichlet_epsilon", "temperature", "round_limit",
    ),
    donate_argnames=("state",),
)
def train_iteration(
    env,
    net,
    tx,
    eval_fn,
    state: TrainState,
    init_states,
    rng,
    iterations: int = 8,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    round_limit: int = 16,
):
    """One fused actor+learner step: batched self-play, then one optimizer
    update on every produced fragment (zero-weighted where invalid).

    With the game batch sharded over the mesh's data axis and params
    replicated, XLA partitions the env/search work per chip and inserts the
    gradient all-reduce over ICI — the TPU-native equivalent of the
    reference's alternate self-play/train process (alpha_parallel.rs:41-98).
    """
    rng, r_sp = jax.random.split(rng)
    traj = self_play_from_states(
        env, eval_fn, state.variables, init_states, r_sp,
        iterations=iterations, c=c,
        dirichlet_alpha=dirichlet_alpha,
        dirichlet_epsilon=dirichlet_epsilon,
        temperature=temperature, round_limit=round_limit,
    )
    t, b = traj.obs.shape[:2]
    obs = traj.obs.reshape(t * b, *traj.obs.shape[2:])
    # dequantize the stored visit probs and apply the temperature power
    # (the trajectory keeps them uint16; see self_play.PROB_QUANT)
    ps = jnp.power(
        traj.probs.reshape(t * b, -1).astype(jnp.float32) / PROB_QUANT,
        1.0 / temperature,
    )
    outcome = traj.outcome.reshape(t * b)
    weight = traj.valid.reshape(t * b).astype(jnp.float32)
    # replace invalid (padding) rows with the nearest preceding REAL sample
    # so BatchNorm batch statistics stay on the data distribution — the
    # loss already zero-weights them, but BN stats are not weight-masked
    # (same rationale as train_epoch's wrapped-sample padding)
    flat_valid = traj.valid.reshape(t * b)
    pos = jnp.where(flat_valid, jnp.arange(t * b), -1)
    fill = jax.lax.associative_scan(jnp.maximum, pos)  # running last-valid
    first_valid = jnp.argmax(flat_valid)  # 0 if none are valid
    fill = jnp.where(fill >= 0, fill, first_valid)
    obs = jnp.take(obs, fill, axis=0)
    ps = jnp.take(ps, fill, axis=0)
    outcome = jnp.take(outcome, fill, axis=0)

    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(net, p, state.batch_stats, obs, ps, outcome, weight),
        has_aux=True,
    )
    (loss, (new_bs, pl, vl)), grads = grad_fn(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=new_params, batch_stats=new_bs, opt_state=new_opt,
        step=state.step + 1,
    )
    metrics = {
        "loss": loss,
        "policy_loss": pl,
        "value_loss": vl,
        "fragments": jnp.sum(weight),
        # winner != 0 counts DECISIVE games; completed draws (possible in
        # TicTacToe) and round-limit truncations both have winner == 0
        "decisive_games": jnp.sum((traj.winner != 0).astype(jnp.int32)),
    }
    return new_state, metrics
