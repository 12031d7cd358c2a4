"""Training-layer tests: loss math, optimizer parity with torch Adam,
replay store, self-play trajectory invariants, checkpointing, gating."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import init_params, make_net
from die_e_tpu.train.learner import (
    create_train_state,
    make_optimizer,
    net_eval_fn,
    train_epoch,
    train_step,
)
from die_e_tpu.train.replay import (
    Memory,
    find_sp_dirs,
    load_all_training_data,
    load_training_data,
    save_training_data,
)
from die_e_tpu.train.self_play import self_play, trajectory_to_memory

NET = make_net(ttt.SPEC)
TX = make_optimizer(1e-3, 1e-4)


def _fake_batch(rng, n=8):
    k1, k2, k3 = jax.random.split(rng, 3)
    obs = jax.random.normal(k1, (n, 3, 3, 3))
    ps = jax.nn.softmax(jax.random.normal(k2, (n, 9)), -1)
    outcome = jax.random.choice(k3, jnp.array([-1.0, 0.0, 1.0]), (n,))
    weight = jnp.ones((n,))
    return obs, ps, outcome, weight


class TestTrainStep:
    def test_loss_decreases_on_repeated_batch(self):
        state = create_train_state(NET, jax.random.PRNGKey(0))
        obs, ps, outcome, w = _fake_batch(jax.random.PRNGKey(1), 16)
        losses = []
        for _ in range(10):
            state, m = train_step(NET, TX, state, obs, ps, outcome, w)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert not any(np.isnan(losses))

    def test_zero_weight_rows_do_not_contribute(self):
        state = create_train_state(NET, jax.random.PRNGKey(0))
        obs, ps, outcome, w = _fake_batch(jax.random.PRNGKey(2), 8)
        _, m_full = train_step(NET, TX, state, obs, ps, outcome, w)
        # duplicate the batch with zero-weight copies appended (identical
        # rows keep BatchNorm batch statistics unchanged, so the weighted
        # loss must match exactly); fresh state — train_step donates it
        state2 = create_train_state(NET, jax.random.PRNGKey(0))
        obs2 = jnp.concatenate([obs, obs])
        ps2 = jnp.concatenate([ps, ps])
        out2 = jnp.concatenate([outcome, outcome])
        w2 = jnp.concatenate([w, jnp.zeros_like(w)])
        _, m_pad = train_step(NET, TX, state2, obs2, ps2, out2, w2)
        np.testing.assert_allclose(
            float(m_full["loss"]), float(m_pad["loss"]), rtol=1e-5
        )

    def test_bn_padding_distortion_is_bounded(self):
        """DIVERGENCES row 17 quantified (VERDICT r3 weak #5): wrapped
        zero-weight padding rows in a partial final batch enter BatchNorm
        batch statistics (double-weighting those rows' stats).  Isolate
        exactly that effect — identical step sequence, except the last
        batch either carries 16 real + 16 wrapped-padding rows or only the
        16 real rows — and bound the divergence of the resulting model.

        Measured (this test, 64-filter net, 80 random rows, 3 steps):
        batch_stats relative L2 delta 6.7e-4, params delta 4.4e-3, probe
        eval-loss delta ~3% (random-target probe — chaotic step
        sensitivity, not bias) — distribution-preserving as argued, now
        with numbers attached (cited in DIVERGENCES row 17)."""
        rng = jax.random.PRNGKey(9)
        obs, ps, outcome, _ = _fake_batch(rng, 80)

        def run(pad_last: bool):
            state = create_train_state(NET, jax.random.PRNGKey(0))
            for i in range(2):  # two full 32-row batches, identical
                sl = slice(32 * i, 32 * (i + 1))
                state, _ = train_step(
                    NET, TX, state, obs[sl], ps[sl], outcome[sl],
                    jnp.ones((32,)),
                )
            if pad_last:  # 16 real + 16 wrapped (rows 0-15) at weight 0
                idx = jnp.concatenate(
                    [jnp.arange(64, 80), jnp.arange(0, 16)]
                )
                w = jnp.concatenate([jnp.ones((16,)), jnp.zeros((16,))])
                state, _ = train_step(
                    NET, TX, state, obs[idx], ps[idx], outcome[idx], w
                )
            else:  # the natural-size final batch (reference semantics)
                sl = slice(64, 80)
                state, _ = train_step(
                    NET, TX, state, obs[sl], ps[sl], outcome[sl],
                    jnp.ones((16,)),
                )
            return state

        s_pad, s_nat = run(True), run(False)

        def flat(tree):
            return np.concatenate([
                np.asarray(x).ravel()
                for x in jax.tree_util.tree_leaves(tree)
            ])

        bs_pad, bs_nat = flat(s_pad.batch_stats), flat(s_nat.batch_stats)
        rel_bs = np.linalg.norm(bs_pad - bs_nat) / max(
            np.linalg.norm(bs_nat), 1e-9
        )
        # eval-mode loss on a fresh probe batch under both models
        p_obs, p_ps, p_out, _ = _fake_batch(jax.random.PRNGKey(17), 32)

        def eval_loss(state):
            policy, value = NET.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                p_obs, train=False,
            )
            ce = -jnp.mean(jnp.sum(
                p_ps / jnp.sum(p_ps, -1, keepdims=True)
                * jnp.log(jnp.maximum(policy, 1e-9)), -1))
            mse = jnp.mean((value[:, 0] - p_out) ** 2)
            return float(ce + mse)

        l_pad, l_nat = eval_loss(s_pad), eval_loss(s_nat)
        rel_loss = abs(l_pad - l_nat) / max(abs(l_nat), 1e-9)
        rel_params = np.linalg.norm(
            flat(s_pad.params) - flat(s_nat.params)
        ) / max(np.linalg.norm(flat(s_nat.params)), 1e-9)
        # the measured bounds DIVERGENCES row 17 cites
        assert rel_bs < 0.005, rel_bs
        assert rel_params < 0.02, rel_params
        assert rel_loss < 0.05, (l_pad, l_nat)

    def test_nan_input_raises_in_epoch(self):
        state = create_train_state(NET, jax.random.PRNGKey(0))
        obs = jnp.full((4, 3, 3, 3), jnp.nan)
        ps = jnp.ones((4, 9)) / 9
        outcome = jnp.zeros((4,))
        with pytest.raises(FloatingPointError):
            train_epoch(
                NET, TX, state, jax.random.PRNGKey(0),
                np.asarray(obs), np.asarray(ps), np.asarray(outcome), 4,
            )


class TestOptimizerParity:
    def test_compact_step_is_bit_identical_to_dense(self):
        """train_step_compact (int8 obs + sparse prob rows, the reduced
        host->device transfer form) must produce the identical update."""
        from die_e_tpu.train.learner import (
            compact_memory,
            train_step,
            train_step_compact,
        )

        rng = np.random.RandomState(0)
        b, a = 16, 1352
        spec = dataclasses.replace(
            ttt.SPEC, num_actions=a, obs_shape=(4, 6, 6), conv_output_size=24
        )
        net = make_net(spec)
        tx = make_optimizer()
        obs = rng.randint(-5, 6, size=(b, 4, 6, 6)).astype(np.float32)
        ps = np.zeros((b, a), np.float32)
        for i in range(b):  # sparse rows like real visit distributions
            cols = rng.choice(a, size=30, replace=False)
            ps[i, cols] = rng.rand(30).astype(np.float32)
        outcome = rng.choice([-1.0, 0.0, 1.0], size=b).astype(np.float32)
        w = np.ones(b, np.float32)

        s1 = create_train_state(net, jax.random.PRNGKey(1))
        s2 = create_train_state(net, jax.random.PRNGKey(1))
        s1, m1 = train_step(net, tx, s1, jnp.asarray(obs), jnp.asarray(ps),
                            jnp.asarray(outcome), jnp.asarray(w))
        obs_i8, ps_idx, ps_val = compact_memory(ps, obs)
        assert ps_idx.shape == (b, 64)
        s2, m2 = train_step_compact(
            net, tx, s2, jnp.asarray(obs_i8), jnp.asarray(ps_idx),
            jnp.asarray(ps_val), jnp.asarray(outcome), jnp.asarray(w),
            num_actions=a,
        )
        assert float(m1["loss"]) == float(m2["loss"])
        for l1, l2 in zip(jax.tree_util.tree_leaves(s1.params),
                          jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_matches_torch_adam_with_weight_decay(self):
        """tch's Adam::default().wd(wd) (reference alphazero.rs:102) is
        torch Adam's *coupled* weight decay.  The optax chain must produce
        bit-comparable updates on a toy problem."""
        torch = pytest.importorskip("torch")

        w0 = np.array([0.5, -1.2, 2.0], np.float32)
        grads = [np.array([0.1, -0.2, 0.3], np.float32),
                 np.array([-0.05, 0.15, 0.2], np.float32)]
        lr, wd = 1e-2, 1e-2

        # torch
        tp = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            tp.grad = torch.tensor(g)
            opt.step()
        torch_result = tp.detach().numpy()

        # optax
        tx = make_optimizer(lr, wd)
        params = jnp.asarray(w0)
        opt_state = tx.init(params)
        for g in grads:
            updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
            params = params + updates
        np.testing.assert_allclose(np.asarray(params), torch_result, rtol=1e-5)


class TestReplayStore:
    def test_roundtrip(self, tmp_path):
        mem = Memory(
            states=np.random.rand(5, 3, 3, 3).astype(np.float32),
            ps=np.random.rand(5, 9).astype(np.float32),
            outcomes=np.array([1, -1, 0, 1, -1], np.float32),
        )
        save_training_data(mem, tmp_path / "sp-0")
        loaded = load_training_data(tmp_path / "sp-0")
        np.testing.assert_array_equal(loaded.states, mem.states)
        np.testing.assert_array_equal(loaded.ps, mem.ps)
        np.testing.assert_array_equal(loaded.outcomes, mem.outcomes)

    def test_find_sp_dirs_recursive(self, tmp_path):
        """main.rs:218-231 directory walk semantics."""
        for run in ("run-a", "run-b"):
            for lrn in ("lrn-0", "lrn-1"):
                for sp in ("sp-0", "sp-1"):
                    (tmp_path / run / lrn / sp).mkdir(parents=True)
        dirs = list(find_sp_dirs(tmp_path))
        assert len(dirs) == 8
        assert all(d.name.startswith("sp-") for d in dirs)
        # pointing at a single sp dir yields exactly it
        assert list(find_sp_dirs(tmp_path / "run-a" / "lrn-0" / "sp-1")) == [
            tmp_path / "run-a" / "lrn-0" / "sp-1"
        ]

    def test_load_all_concatenates(self, tmp_path):
        m = Memory(
            states=np.zeros((2, 3, 3, 3), np.float32),
            ps=np.zeros((2, 9), np.float32),
            outcomes=np.zeros((2,), np.float32),
        )
        save_training_data(m, tmp_path / "lrn-0" / "sp-0")
        save_training_data(m, tmp_path / "lrn-0" / "sp-1")
        allm = load_all_training_data(tmp_path)
        assert len(allm) == 4

    def test_missing_data_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_training_data(tmp_path / "nope")


class TestSelfPlay:
    def _run(self, seed=0):
        eval_fn = net_eval_fn(NET)
        variables = init_params(NET, jax.random.PRNGKey(0))
        return self_play(
            ttt.ENV, eval_fn, variables, jax.random.PRNGKey(seed),
            batch_size=8, iterations=16, c=2.0, temperature=1.25,
            round_limit=9,
        )

    def test_trajectory_invariants(self):
        traj = self._run()
        valid = np.asarray(traj.valid)
        player = np.asarray(traj.player)
        outcome = np.asarray(traj.outcome)
        winner = np.asarray(traj.winner)
        assert set(np.unique(winner)).issubset({-1, 0, 1})
        # outcome relabeling: winner from each fragment's player perspective
        # (alpha_parallel.rs:215-223)
        np.testing.assert_array_equal(outcome, winner[None, :] * player)
        # every game has at least one recorded move
        assert (valid.sum(0) >= 1).all()
        # ttt games never exceed 9 moves
        assert (valid.sum(0) <= 9).all()

    def test_probs_are_temperature_powers(self):
        traj = self._run()
        valid = np.asarray(traj.valid)
        # stored rows are uint16-quantized NORMALIZED visit probs ...
        assert traj.probs.dtype == np.uint16
        q = np.asarray(traj.probs).reshape(-1, 9)[valid.reshape(-1)]
        sums = q.astype(np.float64).sum(-1) / 65535.0
        np.testing.assert_allclose(sums, 1.0, atol=2e-4)
        # ... and memory extraction applies the pi^(1/1.25) temperature
        # power (alpha_parallel.rs:164-166): unnormalized, sums in (0, 9]
        _, ps, _ = trajectory_to_memory(traj, temperature=1.25)
        expect = np.power(q.astype(np.float32) / 65535.0, 1 / 1.25)
        np.testing.assert_allclose(ps, expect, rtol=1e-6)

    def test_deterministic(self):
        t1, t2 = self._run(7), self._run(7)
        np.testing.assert_array_equal(np.asarray(t1.winner), np.asarray(t2.winner))
        np.testing.assert_array_equal(np.asarray(t1.probs), np.asarray(t2.probs))

    def test_memory_extraction(self):
        traj = self._run()
        obs, ps, outcome = trajectory_to_memory(traj)
        n = int(np.asarray(traj.valid).sum())
        assert obs.shape == (n, 3, 3, 3)
        assert ps.shape == (n, 9)
        assert outcome.shape == (n,)

    @pytest.mark.parametrize("chunk_rounds", [2, 3, 9])
    def test_hosted_chunked_is_bit_identical(self, chunk_rounds):
        """The chunked host driver threads the loop rng through the chunks,
        so ANY chunking reproduces the one-program trajectory exactly."""
        from die_e_tpu.train.self_play import self_play_hosted

        traj = self._run(seed=5)
        f_obs, f_ps, f_outcome = trajectory_to_memory(traj, 1.25)
        obs, ps, outcome, winner, moves = self_play_hosted(
            ttt.ENV, net_eval_fn(NET), init_params(NET, jax.random.PRNGKey(0)),
            jax.random.PRNGKey(5), batch_size=8, iterations=16, c=2.0,
            temperature=1.25, round_limit=9, chunk_rounds=chunk_rounds,
        )
        np.testing.assert_array_equal(winner, np.asarray(traj.winner))
        np.testing.assert_array_equal(obs, f_obs)
        np.testing.assert_allclose(ps, f_ps, rtol=1e-6)
        np.testing.assert_array_equal(outcome, f_outcome)
        assert moves == len(f_obs)

    def test_hosted_compaction_semantics(self):
        """Batch compaction (re-pack live games at chunk boundaries,
        DIVERGENCES.md row 12) reshapes the rng draws so trajectories
        differ from the fused form, but every game still finishes, every
        fragment's outcome is its game winner from its player's
        perspective, and winners land on the right original game ids."""
        from die_e_tpu.train.self_play import self_play_hosted

        obs, ps, outcome, winner, moves = self_play_hosted(
            ttt.ENV, net_eval_fn(NET), init_params(NET, jax.random.PRNGKey(0)),
            jax.random.PRNGKey(5), batch_size=16, iterations=16, c=2.0,
            temperature=1.25, round_limit=9, chunk_rounds=2,
            compact=True, min_batch=2,
        )
        assert winner.shape == (16,)
        assert moves == len(obs) > 0
        assert set(np.unique(winner)) <= {-1, 0, 1}
        # ttt at round_limit 9 always finishes; no draws-by-limit games
        # means every game has a recorded terminal result or a real draw
        assert np.all(np.abs(outcome) <= 1.0)
        # fragment outcomes must be consistent within a game: re-derive
        # the winner per fragment from (outcome, player) is impossible
        # without gidx, but outcome values must come from {-w, 0, +w}
        assert ps.shape == (len(obs), 9)

    def test_hosted_sparse_wire_format_is_bit_identical(self, monkeypatch):
        """The sparse root-children (action, visits) wire format + int8
        obs (the round-4 tunnel-transfer cut) must reproduce the dense
        uint16 path bit-for-bit: same memory, same winners."""
        from die_e_tpu.train.self_play import self_play_hosted

        def run():
            return self_play_hosted(
                ttt.ENV, net_eval_fn(NET),
                init_params(NET, jax.random.PRNGKey(0)),
                jax.random.PRNGKey(5), batch_size=8, iterations=16, c=2.0,
                temperature=1.25, round_limit=9, chunk_rounds=3,
            )

        monkeypatch.setenv("DIE_E_SP_SPARSE", "0")
        monkeypatch.setenv("DIE_E_SP_OBS_I8", "0")
        d_obs, d_ps, d_outcome, d_winner, d_moves = run()
        monkeypatch.setenv("DIE_E_SP_SPARSE", "1")
        monkeypatch.setenv("DIE_E_SP_OBS_I8", "1")
        s_obs, s_ps, s_outcome, s_winner, s_moves = run()
        assert s_obs.dtype == np.float32
        np.testing.assert_array_equal(s_obs, d_obs)
        np.testing.assert_array_equal(s_ps, d_ps)
        np.testing.assert_array_equal(s_outcome, d_outcome)
        np.testing.assert_array_equal(s_winner, d_winner)
        assert s_moves == d_moves

    def test_dense_q_from_sparse_exact(self):
        """Host reconstruction == the device's dense quantization for
        random sparse records (incl. empty rows and duplicate-free
        actions)."""
        import jax.numpy as jnp

        from die_e_tpu.train.self_play import PROB_QUANT, _dense_q_from_sparse

        rng = np.random.default_rng(3)
        f, n, a = 37, 17, 29
        act = np.full((f, n), -1, np.int16)
        vis = np.zeros((f, n), np.uint16)
        for i in range(f):
            k = rng.integers(0, n)
            acts = rng.choice(a, size=k, replace=False).astype(np.int16)
            act[i, :k] = acts
            vis[i, :k] = rng.integers(1, 100, size=k)
        got = _dense_q_from_sparse(act, vis, a)
        # device-side dense reference
        counts = np.zeros((f, a), np.float32)
        for i in range(f):
            for j in range(n):
                if act[i, j] >= 0:
                    counts[i, act[i, j]] += vis[i, j]
        total = jnp.sum(jnp.asarray(counts), axis=-1, keepdims=True)
        probs = jnp.where(total > 0, counts / jnp.maximum(total, 1e-9), 0.0)
        expect = np.asarray(
            jnp.round(jnp.clip(probs, 0.0, 1.0) * PROB_QUANT).astype(jnp.uint16)
        )
        np.testing.assert_array_equal(got, expect)
        # all-empty input
        assert _dense_q_from_sparse(
            np.full((0, n), -1, np.int16), np.zeros((0, n), np.uint16), a
        ).shape == (0, a)

    def test_compaction_primitives(self):
        from die_e_tpu.envs.base import compact_take, compaction_plan

        done = np.array([True, False, True, False, True, True, True, True])
        idx = compaction_plan(done, min_batch=2)
        # 2 live games -> ladder batch of 2: exactly the live indices
        np.testing.assert_array_equal(idx, [1, 3])
        # 3 live -> ladder size 3 (= 3*2^0; the {2^k, 3*2^k} ladder's
        # intermediates halve done-row padding vs pure pow2)
        done3 = np.array([False, True, False, True, False, True, True, True])
        np.testing.assert_array_equal(
            compaction_plan(done3, min_batch=2), [0, 2, 4])
        # 5 live of 8 -> ladder size 6, padded with a finished game
        done5 = np.array([False, False, False, False, False, True, True, True])
        np.testing.assert_array_equal(
            compaction_plan(done5, min_batch=2), [0, 1, 2, 3, 4, 5])
        # 6 live of 8 -> ladder size 6 (a pure-pow2 ladder kept 8)
        np.testing.assert_array_equal(
            compaction_plan(~done, min_batch=2), [0, 2, 4, 5, 6, 7])
        # not worth shrinking: 7 live of 8 -> ladder 8 == current batch
        done7 = np.array([True] + [False] * 7)
        assert compaction_plan(done7, min_batch=2) is None
        assert compaction_plan(done, min_batch=8) is None
        # min_batch floors the ladder: 2 live with min_batch 6 -> size 6
        assert len(compaction_plan(done, min_batch=6)) == 6

        states = jax.vmap(ttt.init)(jnp.arange(8, dtype=jnp.uint32))
        taken, tdone = compact_take(states, jnp.asarray(done), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(tdone), [False, False])
        np.testing.assert_array_equal(
            np.asarray(taken.board), np.asarray(states.board)[[1, 3]])

    def test_compaction_tracker(self):
        """CompactionTracker: winners recorded before a compaction drops a
        game survive the re-mapping; never-finished games are draws (0)."""
        from die_e_tpu.envs.base import CompactionTracker, compaction_plan

        tr = CompactionTracker(8)
        # chunk 1 (full mapping): games 0 and 5 finish
        done = np.array([True, False, False, False, False, True, False, False])
        winner = np.array([1, 0, 0, 0, 0, -1, 0, 0], np.int32)
        tr.merge(done, winner)
        np.testing.assert_array_equal(tr.current_done(), done)
        # compact to the 6 live games -> pow2 8? plan says shrink to... 6->8
        # not worthwhile at b=8; force a take of the live games + 2 fills
        idx = np.array([1, 2, 3, 4, 6, 7, 0, 5], np.int32)
        tr.take(idx)
        # chunk 2 (compacted mapping): slots 0,1,2 (orig 1,2,3) finish
        done2 = np.zeros(8, bool)
        done2[[0, 1, 2]] = True
        done2[6] = True  # fill slot for orig game 0: done stays true
        win2 = np.zeros(8, np.int32)
        win2[[0, 1, 2]] = [-1, 1, -1]
        win2[6] = 1
        tr.merge(done2, win2)
        final = tr.final_winner()
        # orig 0/5 won in chunk 1 (+1/-1), orig 1/2/3 in chunk 2 (-1/+1/-1),
        # everything else never finished -> 0 (round-limit draw)
        np.testing.assert_array_equal(final, [1, -1, 1, -1, 0, -1, 0, 0])
        # a stale-done projection keeps every live game (orig 4 in slot 3)
        assert not tr.current_done()[3]
        # and compaction_plan on it packs live-first
        plan = compaction_plan(tr.current_done(), min_batch=2)
        assert plan is not None and not tr.current_done()[plan[0]]


class TestCheckpoint:
    def test_variables_roundtrip(self, tmp_path):
        from die_e_tpu.train import checkpoint as ckpt

        variables = init_params(NET, jax.random.PRNGKey(3))
        ckpt.save_variables(variables, tmp_path / "m")
        restored = ckpt.restore_variables(tmp_path / "m", variables)
        for a, b in zip(
            jax.tree_util.tree_leaves(variables),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bootstrap_order(self, tmp_path):
        """explicit path > best model > scratch (alphazero.rs:86-100)."""
        from die_e_tpu.train import checkpoint as ckpt

        rng = jax.random.PRNGKey(4)
        _, src = ckpt.bootstrap_variables(NET, rng, "tictactoe", None,
                                          str(tmp_path))
        assert src == "scratch"
        variables = init_params(NET, rng)
        best = ckpt.best_model_path("tictactoe", str(tmp_path))
        ckpt.save_variables(variables, best)
        _, src = ckpt.bootstrap_variables(NET, rng, "tictactoe", None,
                                          str(tmp_path))
        assert src == str(best)
        explicit = tmp_path / "explicit"
        ckpt.save_variables(variables, explicit)
        _, src = ckpt.bootstrap_variables(NET, rng, "tictactoe",
                                          str(explicit), str(tmp_path))
        assert src == str(explicit)


class TestGating:
    def test_first_gate_promotes(self, tmp_path):
        from die_e_tpu.core.config import ArenaConfig, MctsConfig
        from die_e_tpu.train import checkpoint as ckpt
        from die_e_tpu.train.gating import gate

        variables = init_params(NET, jax.random.PRNGKey(5))
        promoted = gate(
            ttt.ENV, net_eval_fn(NET), variables, jax.random.PRNGKey(0),
            MctsConfig(iterations=4), ArenaConfig(num_games=4, round_limit=9),
            temperature=1.25, models_base=str(tmp_path),
        )
        assert promoted
        assert ckpt.best_model_path("tictactoe", str(tmp_path)).exists()

    @pytest.mark.parametrize(
        "winrate,expect_promoted,expect_result",
        [
            (0.60, True, "promoted"),          # >= 0.55 (alpha_versus.rs:74)
            (0.55, True, "promoted"),
            (0.40, False, "best_kept"),        # <= 0.45 (alpha_versus.rs:75)
            (0.45, False, "best_kept"),
            (0.50, False, "inconclusive_kept"),  # in between (:76-77)
        ],
    )
    def test_gate_thresholds(self, tmp_path, monkeypatch, winrate,
                             expect_promoted, expect_result):
        """Promote / keep-best / inconclusive branches
        (alpha_versus.rs:74-77) with a stubbed arena."""
        from die_e_tpu.arena.versus import Agent, PlayResult
        from die_e_tpu.core.config import ArenaConfig, MctsConfig
        from die_e_tpu.train import checkpoint as ckpt
        from die_e_tpu.train import gating

        # install an existing best so the match branch runs
        best_vars = init_params(NET, jax.random.PRNGKey(6))
        best_path = ckpt.best_model_path("tictactoe", str(tmp_path))
        ckpt.save_variables(best_vars, best_path)
        def flat(vs):
            return np.concatenate(
                [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(vs)]
            )

        marker = flat(best_vars)

        wins = int(winrate * 20)

        def fake_play(*args, **kwargs):
            return PlayResult(
                player1=Agent.MODEL, player2=Agent.MODEL,
                wins_p1=wins, wins_p2=20 - wins, draws=0, n_games=20,
                winrate=winrate, games=[],
            )

        monkeypatch.setattr(gating, "play", fake_play)
        candidate = init_params(NET, jax.random.PRNGKey(7))
        events = []

        class Log:
            def log(self, event, **kw):
                events.append((event, kw))

        promoted = gating.gate(
            ttt.ENV, net_eval_fn(NET), candidate, jax.random.PRNGKey(0),
            MctsConfig(iterations=2), ArenaConfig(num_games=20, round_limit=9),
            temperature=1.25, models_base=str(tmp_path), metrics=Log(),
        )
        assert promoted == expect_promoted
        gate_events = [kw for ev, kw in events if ev == "gate"]
        assert gate_events and gate_events[0]["result"] == expect_result
        # the best checkpoint changed iff promoted
        now = flat(ckpt.restore_variables(best_path, candidate))
        changed = not np.array_equal(now, marker)
        assert changed == expect_promoted



class TestDeviceEpoch:
    """train_epoch_device: the fused on-device epoch must reproduce the
    per-batch host loop's math (same batches -> same params).

    Comparisons run under plain SGD: the update is proportional to the
    gradient, so the ~1e-10 cross-compilation cancellation noise stays
    ~1e-10 in the params.  Under Adam the comparison is ill-posed — its
    normalization amplifies that noise to a full +/-lr step on any
    analytically-zero-gradient element (conv biases feeding BatchNorm,
    dead kernel weights), in the host loop as much as the scan.  The
    shared step math itself (_step_math) is what both paths run; Adam
    semantics are covered by TestOptimizerParity."""

    LR = 0.01

    def _sgd_state(self, tx):
        import optax  # local: only this test builds a non-Adam state

        variables = init_params(NET, jax.random.PRNGKey(0))
        from die_e_tpu.train.learner import TrainState
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.int32(0),
        )

    def _memory(self, rng, n):
        obs, ps, outcome, _ = _fake_batch(rng, n)
        return np.asarray(obs), np.asarray(ps), np.asarray(outcome)

    @staticmethod
    def _assert_params_match(ref_params, got_params):
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
        flat_got = jax.tree_util.tree_leaves(got_params)
        for (path, a), b in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_matches_host_epoch_same_permutation(self):
        import optax

        from die_e_tpu.train.learner import (
            train_epoch_device, upload_epoch_data,
        )

        tx = optax.sgd(self.LR)
        n, bs = 32, 8
        obs, ps, outcome = self._memory(jax.random.PRNGKey(3), n)
        r_ep = jax.random.PRNGKey(5)

        host_state = self._sgd_state(tx)
        host_ms: list = []
        host_state = train_epoch(NET, tx, host_state, r_ep, obs, ps,
                                 outcome, bs, host_ms)

        dev_state = self._sgd_state(tx)
        data = upload_epoch_data(obs, ps, outcome, bs, bucket=n)
        assert data.padded_rows == n  # no padding: identical batches
        perm = jax.random.permutation(r_ep, n)  # the host loop's perm
        dev_ms: list = []
        dev_state = train_epoch_device(NET, tx, dev_state, r_ep, data, bs,
                                       dev_ms, perm=perm)

        self._assert_params_match(host_state.params, dev_state.params)
        np.testing.assert_allclose(host_ms[0]["loss"], dev_ms[0]["loss"],
                                   rtol=1e-5)

    def test_padding_rows_train_at_zero_weight(self):
        import optax

        from die_e_tpu.train.learner import (
            train_epoch_device, train_step, upload_epoch_data,
        )

        tx = optax.sgd(self.LR)
        n, bs = 24, 8
        obs, ps, outcome = self._memory(jax.random.PRNGKey(4), n)
        data = upload_epoch_data(obs, ps, outcome, bs, bucket=32)
        assert data.padded_rows == 32

        # identity permutation: batches 0-2 are the real rows in order, the
        # 4th is all wrapped padding at weight 0
        perm = jnp.arange(32)
        dev_state = self._sgd_state(tx)
        dev_state = train_epoch_device(NET, tx, dev_state,
                                       jax.random.PRNGKey(0), data, bs,
                                       perm=perm)

        # manual replay: three real batches then the wrapped batch at w=0
        man_state = self._sgd_state(tx)
        for start in range(0, n, bs):
            sl = slice(start, start + bs)
            man_state, _ = train_step(
                NET, tx, man_state, jnp.asarray(obs[sl]),
                jnp.asarray(ps[sl]), jnp.asarray(outcome[sl]), jnp.ones(bs))
        wrap = np.arange(24, 32) % n
        man_state, _ = train_step(
            NET, tx, man_state, jnp.asarray(obs[wrap]), jnp.asarray(ps[wrap]),
            jnp.asarray(outcome[wrap]), jnp.zeros(bs))
        self._assert_params_match(man_state.params, dev_state.params)

    def test_int8_observation_path(self):
        import optax

        from die_e_tpu.train.learner import (
            train_epoch_device, train_step, upload_epoch_data,
        )

        tx = optax.sgd(self.LR)
        n, bs = 16, 8
        rng = jax.random.PRNGKey(6)
        obs = np.asarray(
            jax.random.randint(rng, (n, 3, 3, 3), -2, 3), np.float32)
        _, ps, outcome, _ = _fake_batch(rng, n)
        ps, outcome = np.asarray(ps), np.asarray(outcome)
        data = upload_epoch_data(obs, ps, outcome, bs, bucket=n)
        assert data.obs.dtype == jnp.int8

        perm = jnp.arange(n)
        dev_state = self._sgd_state(tx)
        dev_state = train_epoch_device(NET, tx, dev_state,
                                       jax.random.PRNGKey(0), data, bs,
                                       perm=perm)
        man_state = self._sgd_state(tx)
        for start in range(0, n, bs):
            sl = slice(start, start + bs)
            man_state, _ = train_step(
                NET, tx, man_state, jnp.asarray(obs[sl]),
                jnp.asarray(ps[sl]), jnp.asarray(outcome[sl]), jnp.ones(bs))
        self._assert_params_match(man_state.params, dev_state.params)

    def test_adam_epoch_runs_and_loss_decreases(self):
        """Smoke: the production optimizer through the device path."""
        from die_e_tpu.train.learner import (
            train_epoch_device, upload_epoch_data,
        )

        n, bs = 32, 8
        obs, ps, outcome = self._memory(jax.random.PRNGKey(8), n)
        data = upload_epoch_data(obs, ps, outcome, bs, bucket=n)
        state = create_train_state(NET, jax.random.PRNGKey(0))
        ms: list = []
        rng = jax.random.PRNGKey(1)
        for _ in range(6):
            rng, r = jax.random.split(rng)
            state = train_epoch_device(NET, TX, state, r, data, bs, ms)
        assert ms[-1]["loss"] < ms[0]["loss"]
        assert all(m["nan"] == 0 for m in ms)

    def test_nan_raises(self):
        from die_e_tpu.train.learner import (
            train_epoch_device, upload_epoch_data,
        )

        obs = np.full((8, 3, 3, 3), np.nan, np.float32)
        ps = np.ones((8, 9), np.float32) / 9
        outcome = np.zeros((8,), np.float32)
        data = upload_epoch_data(obs, ps, outcome, 8, bucket=8)
        state = create_train_state(NET, jax.random.PRNGKey(0))
        with pytest.raises(FloatingPointError):
            train_epoch_device(NET, TX, state, jax.random.PRNGKey(0),
                               data, 8)
