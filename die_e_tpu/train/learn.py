"""The AlphaZero learn loop (self-play -> train -> gate).

Rebuilds the reference's learn_parallel (reference
src/alphazero/alpha_parallel.rs:17-99) with the identical iteration
structure: per learn iteration, ``self_play_iterations`` batched self-play
runs append to the iteration memory and are persisted under
``data/{game}/run-{id}/lrn-{i}/sp-{j}`` (:43-62); then ``num_epochs``
training passes (:78-81), a finite-weights check (:83), a per-iteration model
checkpoint ``models/{game}/model_{i}`` (:85-95), and a gate against the best
model (:96).

The B=1 single-game configuration reproduces the reference's legacy
sequential learn/self_play (alpha_no_parallel.rs:7-84) — set
``num_self_play_batches=1``.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from die_e_tpu.core.config import Config
from die_e_tpu.core.metrics import Metrics, Timer
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.train import checkpoint as ckpt
from die_e_tpu.train.gating import gate
from die_e_tpu.train.learner import (
    compact_memory,
    create_train_state,
    make_optimizer,
    net_eval_fn,
    train_epoch,
    train_epoch_device,
    upload_epoch_data,
)
from die_e_tpu.train.replay import Memory, save_training_data
from die_e_tpu.train.self_play import (
    self_play_from_states,
    self_play_hosted,
    trajectory_to_memory,
)


def _write_meta_atomic(path: Path, meta: dict) -> None:
    """Write the resume cursor atomically (tmp + rename): a kill landing
    mid-write must never leave a truncated JSON that would crash-loop
    every subsequent ``--resume`` under the watchdog."""
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, path)


def learn(
    env,
    config: Config,
    seed: int = 0,
    model_path: Optional[str] = None,
    data_base: str = "./data",
    models_base: str = "./models",
    metrics: Optional[Metrics] = None,
    run_id: Optional[str] = None,
    resume: bool = False,
):
    """Run the full learn loop; returns the final TrainState."""
    if metrics is None:
        metrics = Metrics()
    az, mcts_cfg, opt = config.alphazero, config.mcts, config.optimizer

    # multi-host: the SAME learn() runs on every process of the cluster
    # (cli --coordinator/--num-processes/--process-id).  Actors are
    # host-sharded (each host self-plays its deterministic slice of the
    # global game set on its local devices), the replay memory is
    # all-gathered so every host trains on the identical global batches,
    # and the SGD step is data-parallel over the GLOBAL mesh with an XLA
    # gradient all-reduce.  Only process 0 touches the filesystem
    # (checkpoints, gate, resume cursor, training-data dumps).
    nproc = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0
    if nproc > 1:
        if az.num_self_play_batches % nproc:
            raise ValueError(
                f"num_self_play_batches={az.num_self_play_batches} not "
                f"divisible by {nproc} processes"
            )
        if az.training_batch_size % nproc:
            raise ValueError(
                f"training_batch_size={az.training_batch_size} not "
                f"divisible by {nproc} processes"
            )

    # resume cursor: models/{game}/latest_meta.json records the run id and
    # the next learn iteration so a killed run continues its numbering
    # (data dirs, model_{i} names, learning-curve indices) — the recovery
    # the reference only gets implicitly from on-disk artifacts
    # (alpha_parallel.rs:85-95 + the offline Train command, SURVEY.md §5)
    meta_path = ckpt.model_dir(env.spec.name, models_base) / "latest_meta.json"
    start_iter = 0
    pending_gate = None
    if resume and meta_path.exists():
        meta = json.loads(meta_path.read_text())
        run_id = run_id or meta.get("run_id")
        start_iter = int(meta.get("next_learn_iter", 0))
        pending_gate = meta.get("pending_gate")
    run_id = run_id or uuid.uuid4().hex[:21]
    if nproc > 1:
        # one run identity for the whole cluster (process 0's draw wins);
        # every process participates, so this is also the startup barrier
        # that keeps a fresh run's processes in collective lockstep
        from jax.experimental.multihost_utils import broadcast_one_to_all

        raw = np.frombuffer(run_id.encode().ljust(21)[:21], np.uint8)
        run_id = bytes(np.asarray(broadcast_one_to_all(raw))).decode().strip()
    run_base = Path(data_base) / env.spec.name / f"run-{run_id}"
    if is_main:
        run_base.mkdir(parents=True, exist_ok=True)
    metrics.log("run_start", run_id=run_id, game=env.spec.name,
                start_iter=start_iter)

    net = make_net(env.spec)
    rng = jax.random.PRNGKey(seed)
    rng, r_init = jax.random.split(rng)
    state = create_train_state(net, r_init, lr=opt.lr, wd=opt.wd)
    variables, source = ckpt.bootstrap_variables(
        net, r_init, env.spec.name, model_path, models_base
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    latest = ckpt.model_dir(env.spec.name, models_base) / "latest_state"
    full_resume = False
    fallback_restored = None  # model_{i} index the fallback ladder restored
    if resume:
        # only process 0 heals interrupted latest_state swaps (rmtree +
        # rename on the SHARED models dir); other processes barrier behind
        # the heal, then resolve read-only — two racing heals would crash
        # the rename loser, and non-main writes violate the "every host
        # reads, only process 0 writes" invariant
        if is_main:
            src = ckpt.resolve_state_dir(latest)
        if nproc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("resume_heal")
        if not is_main:
            src = ckpt.resolve_state_dir(latest, heal=False)
        if src is not None:
            try:
                # full resume incl. optimizer state (the reference rebuilds
                # Adam fresh every run, alphazero.rs:102 — a documented
                # quirk fix)
                state = ckpt.restore_state(src, state)
                full_resume = True
                source = f"{src} (full train state)"
            except Exception as e:  # torn legacy in-place save / disk loss
                metrics.log("checkpoint_unreadable", path=str(src),
                            error=repr(e)[:200])
        if not full_resume and start_iter:
            # fallback ladder: newest intact model_{i} below the cursor —
            # inference variables only, optimizer restarts fresh (the
            # reference's own behavior on EVERY run, alphazero.rs:102), so
            # a torn latest_state costs Adam moments, not training progress
            for i in range(start_iter - 1, -1, -1):
                mp_i = ckpt.model_dir(env.spec.name, models_base) / f"model_{i}"
                if not mp_i.exists():
                    continue
                try:
                    variables = ckpt.restore_variables(mp_i, state.variables)
                except Exception as e:
                    metrics.log("checkpoint_unreadable", path=str(mp_i),
                                error=repr(e)[:200])
                    continue
                state = state.replace(params=variables["params"],
                                      batch_stats=variables["batch_stats"])
                source = f"{mp_i} (variables only, fresh optimizer)"
                fallback_restored = i
                break
    metrics.log("model_bootstrap", source=source)
    tx = make_optimizer(opt.lr, opt.wd)
    # inference (self-play search + arena gating) compute dtype: f32 by
    # default — measured FASTER than explicit bf16 at this model size (XLA
    # already routes f32 convs through bf16 MXU passes, BASELINE.md round 2)
    # — with bf16 as the DIE_E_BF16=1 opt-in for larger nets; training
    # stays f32 (the reference is f32 everywhere, src/lib.rs:20)
    from die_e_tpu.core.mesh import compute_dtype

    eval_fn = net_eval_fn(make_net(env.spec, dtype=compute_dtype()))

    # multi-chip: shard the self-play game batch over the mesh's data axis,
    # replicate params (the reference is single-device, lib.rs:22-30; this
    # is the scale-out the TPU rebuild adds, SURVEY.md section 2)
    mesh = None
    data_sh = None
    if len(jax.devices()) > 1:
        from die_e_tpu.core.mesh import (
            batch_sharding, make_mesh, replicated, shard_batch,
        )

        mesh = make_mesh(config.mesh.data, config.mesh.model)
        n_data = mesh.shape["data"]
        if az.training_batch_size % n_data:
            raise ValueError(
                f"training_batch_size={az.training_batch_size} not divisible "
                f"by the mesh data axis ({n_data} shards) — fixed-size "
                f"batches are placed row-sharded over it"
            )
        if az.num_self_play_batches % n_data:
            raise ValueError(
                f"num_self_play_batches={az.num_self_play_batches} not "
                f"divisible by the mesh data axis ({n_data} shards)"
            )
        data_sh, repl = batch_sharding(mesh), replicated(mesh)
        # via host numpy: multi-process device_put accepts host arrays for
        # shardings that span non-addressable devices (every process holds
        # the identical state — same seed / same restored checkpoint)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), repl), state
        )
        metrics.log("mesh", devices=len(jax.devices()),
                    data=mesh.shape["data"], model=mesh.shape["model"])

    def host_variables(variables):
        """Process-LOCAL copy of the (replicated) inference variables for
        computations one process runs alone on its own devices — the
        host-sharded self-play actors and the process-0 gate arena.
        Passing global-mesh arrays into a jit that only SOME processes
        execute would hang the cluster: every process must participate in
        a global-mesh computation.  np.asarray is legal cross-process here
        because replicated arrays are fully replicated."""
        if nproc == 1:
            return variables
        return jax.tree_util.tree_map(np.asarray, variables)

    def run_self_play(variables, r_sp, stats=None):
        """Returns (obs, ps, outcome, winner [B], n_fragments).

        Single-device: chunked host driver (bounded per-program duration
        and memory, incremental fragment fetch).  Multi-process: host-
        sharded actors + all-gathered memory.  Single-process multi-device
        mesh: the fully fused sharded program."""
        if nproc > 1:
            from die_e_tpu.parallel.multihost import (
                allgather_memory,
                allgather_memory_sparse,
            )

            # the global game set is derived from the shared rng stream, so
            # it is identical regardless of host count; each host plays its
            # contiguous slice with a host-distinct loop rng
            r_sp, r_seed = jax.random.split(r_sp)
            global_seeds = np.asarray(
                jax.random.randint(
                    r_seed, (az.num_self_play_batches,), 0, 2**31 - 1
                )
            ).astype(np.uint32)
            per = az.num_self_play_batches // nproc
            local_seeds = global_seeds[pid * per:(pid + 1) * per]
            obs, ps, outcome, winner_l, _ = self_play_hosted(
                env, eval_fn, host_variables(variables),
                jax.random.fold_in(r_sp, pid),
                batch_size=per,
                iterations=mcts_cfg.iterations,
                c=mcts_cfg.c,
                dirichlet_alpha=mcts_cfg.dirichlet_alpha,
                dirichlet_epsilon=mcts_cfg.dirichlet_epsilon,
                temperature=az.temperature,
                round_limit=mcts_cfg.simulate_round_limit,
                negamax=mcts_cfg.negamax,
                init_seeds=local_seeds,
                stats=stats,
            )
            # winner is one row per GAME, the memory arrays one row per
            # FRAGMENT — gather it separately so each collective trims by
            # its own per-host counts (gathering them together zero-padded
            # winner from games to fragments, inflating the draws metric)
            if os.environ.get("DIE_E_MH_SPARSE", "1") == "1":
                # CSR prob rows + int8 obs/outcomes over DCN — ~10x fewer
                # bytes, bit-equal gathered memory (multihost.py)
                obs, ps, outcome = allgather_memory_sparse(
                    obs, ps, outcome,
                    obs_int8=bool(getattr(env.spec, "obs_int8", False)),
                    stats=stats,
                )
            else:
                obs, ps, outcome = allgather_memory(obs, ps, outcome)
            (winner,) = allgather_memory(np.asarray(winner_l))
            return obs, ps, outcome, winner, len(obs)
        if mesh is None:
            return self_play_hosted(
                env, eval_fn, variables, r_sp,
                batch_size=az.num_self_play_batches,
                iterations=mcts_cfg.iterations,
                c=mcts_cfg.c,
                dirichlet_alpha=mcts_cfg.dirichlet_alpha,
                dirichlet_epsilon=mcts_cfg.dirichlet_epsilon,
                temperature=az.temperature,
                round_limit=mcts_cfg.simulate_round_limit,
                negamax=mcts_cfg.negamax,
                stats=stats,
            )
        r_sp, r_seed = jax.random.split(r_sp)
        seeds = jax.random.randint(
            r_seed, (az.num_self_play_batches,), 0, 2**31 - 1
        ).astype(jax.numpy.uint32)
        init_states = shard_batch(mesh, jax.vmap(env.init)(seeds))
        traj = self_play_from_states(
            env, eval_fn, variables, init_states, r_sp,
            iterations=mcts_cfg.iterations,
            c=mcts_cfg.c,
            dirichlet_alpha=mcts_cfg.dirichlet_alpha,
            dirichlet_epsilon=mcts_cfg.dirichlet_epsilon,
            temperature=az.temperature,
            round_limit=mcts_cfg.simulate_round_limit,
            negamax=mcts_cfg.negamax,
        )
        obs, ps, outcome = trajectory_to_memory(traj, az.temperature)
        return (obs, ps, outcome, np.asarray(traj.winner), len(obs))

    if (pending_gate is not None and is_main
            and (full_resume or fallback_restored == int(pending_gate))):
        # the previous run died between committing model_{g}/latest_state
        # and finishing that iteration's gate (the gate arena is the
        # longest device window, so the likeliest crash site): run the
        # missed gate now so every checkpoint challenges best exactly once.
        # latest_state IS iteration g's state — pending_gate is only ever
        # written by iteration g's own commit.  The fallback path also
        # qualifies when it restored model_{g} itself (same inference
        # variables, fresh optimizer): g is durably on disk — pending_gate
        # commits only after its save — so it must still challenge best
        # instead of the pending flag being silently overwritten.
        # At-least-once gate semantics: a kill between the async cursor
        # commit (pending_gate=g) and the post-gate cursor write re-runs a
        # gate that may already have finished, with a DIFFERENT rng
        # (r_catch, not the original r_gate) — metrics.jsonl can then show
        # two gate events for one iteration, and after a promotion the
        # re-run gates the model against itself (a no-op at the 0.55
        # threshold: self-play winrate ~0.5 keeps best).
        g = int(pending_gate)
        metrics.log("gate_resume", learn_iter=g)
        r_catch = jax.random.fold_in(jax.random.PRNGKey(seed), 0x6A7E + g)
        gate(
            env, eval_fn, host_variables(state.variables), r_catch, mcts_cfg,
            config.arena, az.temperature, models_base, metrics,
        )
        _write_meta_atomic(
            meta_path, {"run_id": run_id, "next_learn_iter": start_iter}
        )

    if start_iter:
        # keep the resumed run's randomness distinct from a fresh replay of
        # the same seed
        rng = jax.random.fold_in(rng, start_iter)
    # checkpoint writes overlap the gating arena + next self-play phase.
    # The non-daemon worker thread only finishes a pending write on
    # PYTHON-level exits (exceptions, sys.exit); SIGTERM/SIGKILL (watchdog
    # stall-kill, pause_run.sh) terminate mid-write — what makes signal
    # kills safe is the two-phase cursor: latest_meta.json is written only
    # from on_committed, so a torn latest_state is never resumed from.
    saver = ckpt.AsyncSaver()
    for l_i in range(start_iter, az.learn_iterations):
        lrn_path = run_base / f"lrn-{l_i}"
        memory = Memory.empty(env.spec.obs_shape, env.spec.num_actions)
        for sp_i in range(az.self_play_iterations):
            rng, r_sp = jax.random.split(rng)
            sp_stats: dict = {}
            with Timer() as t:
                obs, ps, outcome, winner, moves = run_self_play(
                    state.variables, r_sp, sp_stats
                )
            frag = Memory(states=obs, ps=ps, outcomes=outcome)
            memory = Memory.concat([memory, frag])
            if is_main:  # multi-process: every host holds the same memory
                save_training_data(frag, lrn_path / f"sp-{sp_i}")
            # CE-floor diagnosis: the policy cross-entropy can never fall
            # below the mean entropy of its MCTS visit-count targets
            # (CE = H(target) + KL), so a "plateaued" policy loss must be
            # read against this floor before concluding learning stalled
            p = frag.ps
            target_entropy = float(np.mean(-np.sum(
                np.where(p > 0, p * np.log(np.maximum(p, 1e-12)), 0.0),
                axis=-1,
            ))) if len(frag) else 0.0
            metrics.log(
                "self_play",
                learn_iter=l_i,
                sp_iter=sp_i,
                fragments=len(frag),
                # moves == valid fragment count (skip-turn rounds excluded);
                # pre-round-2 curve entries counted raw rounds played
                moves_per_s=moves / max(t.elapsed, 1e-9),
                sims_per_s=moves * mcts_cfg.iterations / max(t.elapsed, 1e-9),
                # device search rate incl. lockstep padding rows (done
                # games between compactions + noop plies): the number to
                # compare against the standalone search bench — sims_per_s
                # counts only fragments that enter training memory
                sims_per_s_device=(
                    sp_stats.get("n_row_rounds", 0) * mcts_cfg.iterations
                    / max(t.elapsed, 1e-9)
                ) if sp_stats.get("n_row_rounds") else None,
                wins_m1=int(np.sum(winner == -1)),
                wins_p1=int(np.sum(winner == 1)),
                draws=int(np.sum(winner == 0)),
                target_entropy=target_entropy,
                # hosted-driver wall attribution (t_fetch = host blocked on
                # the pending chunk — device+transfer the 1-deep pipeline
                # failed to hide) for the pipeline-vs-bench gap analysis
                **sp_stats,
            )

        # single-device: move the iteration's memory to the chip ONCE and
        # run the epochs as fused on-device scans (no per-batch dispatch /
        # upload — see learner.train_epoch_device); the mesh path keeps the
        # per-batch host loop that shards each batch over the data axis
        epoch_data = (
            upload_epoch_data(memory.states, memory.ps, memory.outcomes,
                              az.training_batch_size)
            if mesh is None else None
        )
        # host-loop path: sparsify the iteration's memory ONCE for all
        # epochs (compact_memory scans the full [N, A] table)
        compact = (
            compact_memory(memory.ps, memory.states)
            if epoch_data is None else None
        )
        # the pending save (if any) reads buffers train_step will donate
        saver.wait()
        for epoch in range(az.num_epochs):
            rng, r_ep = jax.random.split(rng)
            ms: list = []
            with Timer() as t:
                if epoch_data is not None:
                    state = train_epoch_device(
                        net, tx, state, r_ep, epoch_data,
                        az.training_batch_size, ms,
                    )
                else:
                    state = train_epoch(
                        net, tx, state, r_ep, memory.states, memory.ps,
                        memory.outcomes, az.training_batch_size, ms,
                        batch_sharding=data_sh if mesh is not None else None,
                        compact=compact,
                    )
            metrics.log(
                "train_epoch",
                learn_iter=l_i,
                epoch=epoch,
                loss=float(np.mean([m["loss"] for m in ms])),
                policy_loss=float(np.mean([m["policy_loss"] for m in ms])),
                value_loss=float(np.mean([m["value_loss"] for m in ms])),
                samples_per_s=len(memory) / max(t.elapsed, 1e-9),
            )

        # finite-weights check (alpha_parallel.rs:83) is inside train_epoch
        model_path_i = ckpt.model_dir(env.spec.name, models_base) / f"model_{l_i}"
        # async: one device fetch feeds model_{i} (inference variables) and
        # latest (full state incl. optimizer); the resume cursor is written
        # only after the state is durably committed.  Two-phase: the commit
        # records pending_gate=l_i, cleared after the gate finishes, so a
        # crash during the gating arena re-runs that gate on resume instead
        # of silently skipping it.
        meta_committed = {
            "run_id": run_id, "next_learn_iter": l_i + 1, "pending_gate": l_i,
        }
        rng, r_gate = jax.random.split(rng)
        if is_main:
            # checkpoints, the gate arena, and the resume cursor run on
            # process 0 only (a multi-process run assumes a shared working
            # directory: every host READS models/, only process 0 writes).
            # Non-main processes skip straight to the next iteration's
            # self-play and naturally rendezvous at its memory all-gather.
            saver.save_state(
                state, latest,
                on_committed=lambda m=meta_committed: _write_meta_atomic(
                    meta_path, m),
                extra_variables_path=model_path_i,
            )
            # marks SUBMISSION of the async save, not durability — the
            # durable commit is the on_committed cursor write above
            metrics.log("model_saved", learn_iter=l_i, path=str(model_path_i))
            gate(
                env, eval_fn, host_variables(state.variables), r_gate,
                mcts_cfg, config.arena, az.temperature, models_base, metrics,
            )
            # order after the async commit above (wait() is a fast no-op
            # here — the save overlapped the whole gate arena)
            saver.wait()
            _write_meta_atomic(
                meta_path, {"run_id": run_id, "next_learn_iter": l_i + 1}
            )
    saver.close()
    return state


def train_offline(
    env,
    config: Config,
    data_path: str,
    seed: int = 0,
    model_path: Optional[str] = None,
    out_path: Optional[str] = None,
    models_base: str = "./models",
    metrics: Optional[Metrics] = None,
):
    """Offline training from saved self-play data — the reference's Train
    CLI command (reference src/main.rs:172-206)."""
    from die_e_tpu.train.replay import load_all_training_data

    if metrics is None:
        metrics = Metrics()
    az, opt = config.alphazero, config.optimizer
    memory = load_all_training_data(data_path)
    metrics.log("train_offline_start", fragments=len(memory))

    net = make_net(env.spec)
    rng = jax.random.PRNGKey(seed)
    rng, r_init = jax.random.split(rng)
    state = create_train_state(net, r_init, lr=opt.lr, wd=opt.wd)
    variables, source = ckpt.bootstrap_variables(
        net, r_init, env.spec.name, model_path, models_base
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    metrics.log("model_bootstrap", source=source)
    tx = make_optimizer(opt.lr, opt.wd)

    compact = compact_memory(memory.ps, memory.states)  # once for all epochs
    for epoch in range(az.num_epochs):
        rng, r_ep = jax.random.split(rng)
        ms: list = []
        state = train_epoch(
            net, tx, state, r_ep, memory.states, memory.ps, memory.outcomes,
            az.training_batch_size, ms, compact=compact,
        )
        metrics.log(
            "train_epoch", epoch=epoch,
            loss=float(np.mean([m["loss"] for m in ms])),
        )

    out = Path(out_path) if out_path else (
        ckpt.model_dir(env.spec.name, models_base) / "trained_model"
    )  # reference default trained_model.ot (main.rs:201-206)
    ckpt.save_variables(state.variables, out)
    metrics.log("model_saved", path=str(out))
    return state
