"""Training state, loss and optimizer.

Rebuilds the reference's AlphaZero::train (reference
src/alphazero/alphazero.rs:202-261) as a jitted optax train step:

* loss = CrossEntropy(policy logits, MCTS probs) + MSE(value, outcome)
  (alphazero.rs:239-247), where the CE target is the (unnormalized)
  temperature-adjusted visit distribution exactly as the reference stores it
  (alpha_parallel.rs:164-166, 192-199).
* optimizer = Adam(lr, betas=(0.9, 0.999), eps=1e-8) with L2 weight decay
  added to the gradient BEFORE the moment estimation — tch's
  Adam::default().wd(wd) (alphazero.rs:102) is torch Adam's coupled
  weight_decay, i.e. optax.add_decayed_weights chained in front of adam,
  NOT decoupled AdamW.
* NaN/Inf guards returned as a jitted flag instead of host asserts
  (alphazero.rs:251-255).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from die_e_tpu.nets.resnet import PolicyValueNet, init_params


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(lr: float = 1e-3, wd: float = 1e-4):
    """torch-Adam-with-weight-decay equivalent (see module doc)."""
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def create_train_state(net: PolicyValueNet, rng, lr: float = 1e-3,
                       wd: float = 1e-4) -> TrainState:
    variables = init_params(net, rng)
    tx = make_optimizer(lr, wd)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )


def net_eval_fn(net: PolicyValueNet):
    """Stable inference closure factory: returns eval_fn(variables, obs) ->
    (softmax policy, value), the shape alpha_search expects (reference
    forward_t, nnet.rs:120-133).  The returned function is cached per net so
    it is a stable jit static arg."""
    if not hasattr(net_eval_fn, "_cache"):
        net_eval_fn._cache = {}
    key = (net.spec, net.dtype)
    if key not in net_eval_fn._cache:
        def eval_fn(variables, obs):
            logits, value = net.apply(variables, obs, train=False)
            return jax.nn.softmax(logits, axis=-1), value

        net_eval_fn._cache[key] = eval_fn
    return net_eval_fn._cache[key]


def loss_fn(net, params, batch_stats, obs, ps, outcome, weight):
    """CE(policy, ps) + MSE(value, outcome), means over real (weighted)
    samples — identical math to alphazero.rs:239-247 with batch padding
    support (the reference's last partial batch, alphazero.rs:206)."""
    (logits, value), mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        obs,
        train=True,
        mutable=["batch_stats"],
    )
    n = jnp.maximum(jnp.sum(weight), 1.0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(ps * logp, axis=-1)
    policy_loss = jnp.sum(ce * weight) / n
    value_loss = jnp.sum(((value[:, 0] - outcome) ** 2) * weight) / n
    loss = policy_loss + value_loss
    return loss, (mutated["batch_stats"], policy_loss, value_loss)


def _step_math(net, tx, state: TrainState, obs, ps, outcome, weight):
    """The traceable body of :func:`train_step` (shared with the fused
    epoch scan, :func:`train_epoch_device`)."""
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(net, p, state.batch_stats, obs, ps, outcome, weight),
        has_aux=True,
    )
    (loss, (new_bs, pl, vl)), grads = grad_fn(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    nan_flag = jnp.logical_or(
        ~jnp.isfinite(loss),
        ~jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(new_params)]
            )
        ),
    )
    new_state = TrainState(
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt,
        step=state.step + 1,
    )
    metrics = {"loss": loss, "policy_loss": pl, "value_loss": vl,
               "nan": nan_flag}
    return new_state, metrics


@partial(jax.jit, static_argnames=("net", "tx"), donate_argnums=(2,))
def train_step(net, tx, state: TrainState, obs, ps, outcome, weight):
    """One Adam step on one batch (alphazero.rs:205-259).  Returns
    (new_state, metrics) where metrics includes a NaN flag replacing the
    reference's asserts (alphazero.rs:251-255)."""
    return _step_math(net, tx, state, obs, ps, outcome, weight)


@partial(jax.jit, static_argnames=("net", "tx", "num_actions"),
         donate_argnums=(2,))
def train_step_compact(net, tx, state: TrainState, obs_i8, ps_idx, ps_val,
                       outcome, weight, num_actions):
    """train_step with host->device-transfer-compact inputs: int8
    observations (the tensorizer emits small exact integers,
    backgammon_logic.rs:198-252) and sparse probability rows
    (ps_idx [B, K] u16 column indices, ps_val [B, K] f32 values; padding
    slots point at column 0 with value 0).  Densified on device, then the
    IDENTICAL loss/optimizer math as train_step — the visit distribution
    from S sims has at most S+1 nonzeros of the 1352 columns, so dense f32
    rows waste ~7x the upload bandwidth (the bottleneck on a tunneled
    chip)."""
    obs = obs_i8.astype(jnp.float32)
    b, k = ps_idx.shape
    ps = jnp.zeros((b, num_actions), jnp.float32)
    ps = ps.at[jnp.arange(b)[:, None], ps_idx.astype(jnp.int32)].add(ps_val)
    return train_step(net, tx, state, obs, ps, outcome, weight)


def _obs_int8_exact(obs) -> bool:
    """True when the tensorizer output is exactly representable as int8
    (small exact integers, backgammon_logic.rs:198-252)."""
    import numpy as np

    return bool(obs.size) and bool(
        np.abs(obs).max() < 127 and np.array_equal(obs, np.rint(obs))
    )


def _sparsify_rows(ps):
    """CSR-pack the nonzero columns of each probability row: returns
    (ps_idx uint16 [N, K], ps_val f32 [N, K]) with K the max row-support
    rounded up to a multiple of 64 (few distinct jit shapes), clamped to
    the action-space width.  Padding slots point at column 0 with value 0.

    The single sparsification used by BOTH transfer-compaction paths
    (compact_memory for the per-batch host loop, upload_epoch_data for the
    device-resident epochs) so the packing semantics cannot drift."""
    import numpy as np

    rows, cols = np.nonzero(ps)
    counts = np.bincount(rows, minlength=ps.shape[0])
    kmax = int(counts.max()) if counts.size else 1
    k = min(ps.shape[1], max(64, ((kmax + 63) // 64) * 64))
    offsets = np.zeros(len(rows), np.int64)
    if len(rows):
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offsets = np.arange(len(rows)) - starts[rows]
    ps_idx = np.zeros((ps.shape[0], k), np.uint16)
    ps_val = np.zeros((ps.shape[0], k), np.float32)
    ps_idx[rows, offsets] = cols.astype(np.uint16)
    ps_val[rows, offsets] = ps[rows, cols]
    return ps_idx, ps_val


def compact_memory(ps, obs):
    """Host-side sparsification for the compact train step: returns
    (obs int8, ps_idx uint16 [N, K], ps_val f32 [N, K]), or None when the
    memory is not compactable (non-int8 observations or near-dense rows) —
    callers fall back to the dense transfer."""
    if not _obs_int8_exact(obs):
        return None
    import numpy as np

    ps_idx, ps_val = _sparsify_rows(ps)
    if ps_idx.shape[1] >= ps.shape[1] // 2:  # dense rows: pointless
        return None
    return obs.astype(np.int8), ps_idx, ps_val


_AUTO_COMPACT = object()


def _put_batch_sharded(x, sharding):
    """Place one host-replicated batch array under ``sharding`` (data axis).

    Single-process: a plain device_put.  Multi-process (every host holds
    the identical full batch — see parallel/multihost.allgather_memory):
    each process uploads only the contiguous row range its own devices
    cover and the runtime assembles the global array — device_put cannot
    target non-addressable devices."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    h, i = jax.process_count(), jax.process_index()
    x = np.asarray(x)
    if x.shape[0] % h:
        raise ValueError(
            f"batch rows {x.shape[0]} not divisible by {h} processes"
        )
    per = x.shape[0] // h
    return jax.make_array_from_process_local_data(
        sharding, x[i * per:(i + 1) * per]
    )


def train_epoch(net, tx, state: TrainState, rng, obs, ps, outcome,
                batch_size: int, metrics_out: list | None = None,
                batch_sharding=None, compact=_AUTO_COMPACT):
    """One shuffled pass over the memory in fixed-size batches; the last
    partial batch is padded with wrapped real samples at zero weight
    (reference shuffles and steps through min-capped slices,
    alphazero.rs:203-206).

    Batches are uploaded in the compact form (int8 obs + sparse prob rows,
    see train_step_compact) whenever the rows are sparse enough — the math
    is bit-identical to the dense step; only the transfer shrinks.

    ``batch_sharding`` (a NamedSharding over the data axis) places each
    batch across the mesh so the SGD step is data-parallel with an XLA
    gradient all-reduce; without it every device would redundantly compute
    the same update against replicated params."""
    import numpy as np

    n = obs.shape[0]
    num_actions = ps.shape[1]
    if compact is _AUTO_COMPACT:
        # callers running several epochs over the SAME memory should
        # sparsify once and pass the result (or None for dense) in —
        # compact_memory scans the full [N, A] table
        compact = compact_memory(ps, obs)
    perm = np.asarray(jax.random.permutation(rng, n))
    # metric accumulators stay DEVICE scalars until the epoch ends: a
    # float() per batch is a blocking host round-trip (~25-50 ms on the
    # tunnel) that serializes the dispatch queue
    acc = None
    n_batches = 0
    for start in range(0, n, batch_size):
        idx = perm[start : start + batch_size]
        w = np.ones(len(idx), np.float32)
        if len(idx) < batch_size:
            # pad with wrapped REAL samples at zero weight: keeps the jit
            # shape fixed without recompiling per remainder size, and keeps
            # BatchNorm batch statistics on the data distribution (the
            # padded rows do enter BN stats; the loss means are exact)
            pad = batch_size - len(idx)
            filler = perm[np.arange(pad) % n]
            idx = np.concatenate([idx, filler])
            w = np.concatenate([w, np.zeros(pad, np.float32)])
        if compact is not None:
            obs_i8, ps_idx, ps_val = compact
            batch = (obs_i8[idx], ps_idx[idx], ps_val[idx], outcome[idx], w)
        else:
            batch = (obs[idx], ps[idx], outcome[idx], w)
        if batch_sharding is not None:
            batch = tuple(_put_batch_sharded(x, batch_sharding) for x in batch)
        else:
            batch = tuple(jnp.asarray(x) for x in batch)
        if compact is not None:
            state, m = train_step_compact(net, tx, state, *batch,
                                          num_actions=num_actions)
        else:
            state, m = train_step(net, tx, state, *batch)
        if acc is None:
            acc = dict(m)
            acc["nan"] = m["nan"].astype(jnp.int32)
        else:
            acc = {
                k: acc[k] + (m[k].astype(jnp.int32) if k == "nan" else m[k])
                for k in acc
            }
        n_batches += 1
    if acc is not None:
        acc = {k: float(v) for k, v in acc.items()}  # one sync per epoch
        if metrics_out is not None:
            metrics_out.append(
                {k: (v / n_batches if k != "nan" else v) for k, v in acc.items()}
            )
        if acc["nan"] > 0:
            raise FloatingPointError(
                "NaN/Inf in loss or weights during training "
                "(reference asserts, alphazero.rs:251-255 / "
                "alpha_parallel.rs:83)"
            )
    return state


# --------------------------------------------------------------------------
# Device-resident epochs: upload the learn-iteration's memory ONCE, then run
# every epoch as a few chained scan programs entirely on device.  The
# per-batch host loop above costs one dispatch round-trip (~120 ms on a
# tunneled chip) plus one compact-batch upload per 256 samples; at the
# reference workload (~190k fragments/iter, alpha_parallel.rs:17-99) that is
# ~760 round-trips and ~180 MB of upload PER EPOCH.  Here the tables cross
# the wire once per learn iteration and each epoch is upload-free: a device
# permutation, row gathers, and the identical _step_math per batch.
# --------------------------------------------------------------------------

# table rows are padded to a BUCKET multiple so every learn iteration
# (whose fragment count varies) reuses the same compiled programs
EPOCH_BUCKET = 16384


@struct.dataclass
class EpochData:
    """Device-resident compact memory for one learn iteration's epochs.

    Rows beyond ``n`` are wrapped copies of real rows (so BatchNorm batch
    statistics stay on the data distribution when one lands in a batch) and
    train at weight 0."""

    obs: jnp.ndarray      # [Np, H, W, C] int8 (or f32 fallback)
    ps_idx: jnp.ndarray   # [Np, K] uint16 sparse column indices
    ps_val: jnp.ndarray   # [Np, K] f32 values (0 in padding slots)
    outcome: jnp.ndarray  # [Np] f32
    n: jnp.ndarray        # scalar i32: real rows
    num_actions: Any = struct.field(pytree_node=False, default=0)

    @property
    def padded_rows(self):
        return self.obs.shape[0]


def upload_epoch_data(obs, ps, outcome, batch_size: int,
                      bucket: int = EPOCH_BUCKET) -> Optional["EpochData"]:
    """Sparsify + bucket-pad the memory on host and place it on device.
    Returns None for an empty memory (caller falls back to the host loop).
    """
    import numpy as np

    n = obs.shape[0]
    if n == 0:
        return None
    num_actions = ps.shape[1]
    ps_idx, ps_val = _sparsify_rows(ps)
    obs_t = obs.astype(np.int8 if _obs_int8_exact(obs) else np.float32)

    n_pad = ((n + bucket - 1) // bucket) * bucket
    if n_pad % batch_size:
        n_pad = ((n_pad + batch_size - 1) // batch_size) * batch_size
    wrap = np.arange(n, n_pad) % n

    def pad(x):
        return np.concatenate([x, x[wrap]]) if n_pad > n else x

    return EpochData(
        obs=jnp.asarray(pad(obs_t)),
        ps_idx=jnp.asarray(pad(ps_idx)),
        ps_val=jnp.asarray(pad(ps_val)),
        outcome=jnp.asarray(pad(outcome.astype(np.float32))),
        n=jnp.int32(n),
        num_actions=num_actions,
    )


@partial(jax.jit, static_argnames=("n_rows",))
def _epoch_perm(rng, n_rows: int):
    return jax.random.permutation(rng, n_rows)


@partial(jax.jit,
         static_argnames=("net", "tx", "n_batches", "batch_size",
                          "num_actions"),
         donate_argnums=(2, 3))
def _epoch_scan(net, tx, state: TrainState, sums, data: EpochData, perm,
                base, n_batches: int, batch_size: int, num_actions: int):
    """``n_batches`` sequential train steps as ONE device program.

    Chunked by the caller so no single XLA execution runs long (the axon
    tunnel kills ~45 s programs, CLAUDE.md); chunks chain on the donated
    state handle so the host never blocks between them."""

    def body(carry, j):
        state, sums = carry
        start = (base + j) * batch_size
        rows = jax.lax.dynamic_slice(perm, (start,), (batch_size,))
        w = (rows < data.n).astype(jnp.float32)
        obs = jnp.take(data.obs, rows, axis=0).astype(jnp.float32)
        idx = jnp.take(data.ps_idx, rows, axis=0).astype(jnp.int32)
        val = jnp.take(data.ps_val, rows, axis=0)
        outc = jnp.take(data.outcome, rows, axis=0)
        ps = jnp.zeros((batch_size, num_actions), jnp.float32)
        ps = ps.at[jnp.arange(batch_size)[:, None], idx].add(val)
        state, m = _step_math(net, tx, state, obs, ps, outc, w)
        sums = {
            "loss": sums["loss"] + m["loss"],
            "policy_loss": sums["policy_loss"] + m["policy_loss"],
            "value_loss": sums["value_loss"] + m["value_loss"],
            "nan": sums["nan"] + m["nan"].astype(jnp.int32),
        }
        return (state, sums), None

    (state, sums), _ = jax.lax.scan(
        body, (state, sums), jnp.arange(n_batches)
    )
    return state, sums


def train_epoch_device(net, tx, state: TrainState, rng, data: EpochData,
                       batch_size: int, metrics_out: list | None = None,
                       chunk_batches: int | None = None, perm=None):
    """One shuffled epoch over device-resident ``data`` — the same
    shuffled-batches semantics as :func:`train_epoch` (alphazero.rs:203-206)
    with padding rows at weight 0 (scattered through the epoch by the
    permutation instead of collected in the last batch; each real row still
    trains exactly once, each batch loss still means over its real rows).

    ``perm`` is injectable for tests; by default a fresh device permutation
    of the padded rows is drawn from ``rng``."""
    import os

    if chunk_batches is None:
        chunk_batches = int(os.environ.get("DIE_E_TRAIN_CHUNK", "128"))
    n_pad = data.padded_rows
    total_batches = n_pad // batch_size
    if perm is None:
        perm = _epoch_perm(rng, n_pad)
    sums = {
        "loss": jnp.float32(0.0), "policy_loss": jnp.float32(0.0),
        "value_loss": jnp.float32(0.0), "nan": jnp.int32(0),
    }
    for base in range(0, total_batches, chunk_batches):
        nb = min(chunk_batches, total_batches - base)
        state, sums = _epoch_scan(
            net, tx, state, sums, data, perm, jnp.int32(base),
            n_batches=nb, batch_size=batch_size,
            num_actions=data.num_actions,
        )
    acc = {k: float(v) for k, v in sums.items()}  # one sync per epoch
    if metrics_out is not None:
        metrics_out.append({
            k: (v / total_batches if k != "nan" else v)
            for k, v in acc.items()
        })
    if acc["nan"] > 0:
        raise FloatingPointError(
            "NaN/Inf in loss or weights during training "
            "(reference asserts, alphazero.rs:251-255 / "
            "alpha_parallel.rs:83)"
        )
    return state
