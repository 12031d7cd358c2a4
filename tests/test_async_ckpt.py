"""train/checkpoint.py AsyncSaver — background checkpoint writes."""

import json
import threading
import time

import jax
import numpy as np
import pytest

from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.train import checkpoint as ckpt
from die_e_tpu.train.learner import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def state():
    net = make_net(ttt.SPEC)
    make_optimizer()
    return create_train_state(net, jax.random.PRNGKey(3))


class TestAsyncSaver:
    def test_matches_sync_save(self, state, tmp_path):
        with ckpt.AsyncSaver() as saver:
            saver.save_state(state, tmp_path / "async")
        ckpt.save_state(state, tmp_path / "sync")
        a = ckpt.restore_state(tmp_path / "async", state)
        b = ckpt.restore_state(tmp_path / "sync", state)
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_extra_variables_path_from_same_fetch(self, state, tmp_path):
        with ckpt.AsyncSaver() as saver:
            saver.save_state(state, tmp_path / "full",
                             extra_variables_path=tmp_path / "vars")
        restored = ckpt.restore_variables(tmp_path / "vars", state.variables)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(restored)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.variables)[0]),
        )

    def test_on_committed_runs_after_checkpoint_exists(self, state, tmp_path):
        """The resume cursor must only ever point at a committed state."""
        seen = {}

        def cursor():
            seen["ckpt_exists"] = (tmp_path / "full").exists()
            (tmp_path / "meta.json").write_text(json.dumps({"next": 1}))

        with ckpt.AsyncSaver() as saver:
            saver.save_state(state, tmp_path / "full", on_committed=cursor)
        assert seen["ckpt_exists"] is True
        assert json.loads((tmp_path / "meta.json").read_text()) == {"next": 1}

    def test_wait_reraises_background_error(self, state, tmp_path):
        saver = ckpt.AsyncSaver()
        saver.submit(lambda: (_ for _ in ()).throw(RuntimeError("disk")))
        with pytest.raises(RuntimeError, match="disk"):
            saver.wait()
        # saver is usable again after the failure surfaced
        saver.save_state(state, tmp_path / "after")
        saver.close()
        assert (tmp_path / "after").exists()

    def test_save_swaps_atomically_and_cleans_up(self, state, tmp_path):
        """Two saves to the same path leave one complete checkpoint and no
        .new/.old swap leftovers (the resume target is never overwritten in
        place — a mid-save kill must not destroy the previous state)."""
        target = tmp_path / "latest"
        with ckpt.AsyncSaver() as saver:
            saver.save_state(state, target)
            saver.wait()
            saver.save_state(state, target)
        assert target.exists()
        assert not (tmp_path / "latest.new").exists()
        assert not (tmp_path / "latest.old").exists()
        restored = ckpt.restore_state(target, state)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(restored)[0]),
            np.asarray(jax.tree_util.tree_leaves(state)[0]),
        )

    def test_resolve_state_dir_heals_interrupted_swap(self, state, tmp_path):
        """A kill between the swap's two renames leaves only latest.new
        (complete); resolve_state_dir renames it into place."""
        target = tmp_path / "latest"
        ckpt.save_state(state, tmp_path / "latest.new")  # complete .new
        assert ckpt.resolve_state_dir(target) == target
        restored = ckpt.restore_state(target, state)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(restored)[0]),
            np.asarray(jax.tree_util.tree_leaves(state)[0]),
        )

    def test_resolve_state_dir_prefers_target_and_prunes(self, state, tmp_path):
        target = tmp_path / "latest"
        ckpt.save_state(state, target)
        (tmp_path / "latest.new").mkdir()  # torn unfinished save
        (tmp_path / "latest.old").mkdir()  # superseded state
        assert ckpt.resolve_state_dir(target) == target
        assert not (tmp_path / "latest.new").exists()
        assert not (tmp_path / "latest.old").exists()
        assert ckpt.resolve_state_dir(tmp_path / "absent") is None

    def test_resolve_state_dir_readonly_mode(self, state, tmp_path):
        """heal=False (non-main processes of a multi-process resume) must
        return the best candidate WITHOUT mutating the shared models dir —
        two racing heals would crash the rename loser, and only process 0
        may write."""
        target = tmp_path / "latest"
        ckpt.save_state(state, tmp_path / "latest.new")
        (tmp_path / "latest.old").mkdir()
        # read-only resolve points at .new, renames nothing, prunes nothing
        assert ckpt.resolve_state_dir(target, heal=False) == \
            tmp_path / "latest.new"
        assert not target.exists()
        assert (tmp_path / "latest.old").exists()
        # after process 0 heals, heal=False resolves the healed target
        assert ckpt.resolve_state_dir(target) == target
        assert ckpt.resolve_state_dir(target, heal=False) == target
        # target present + stale leftovers: read-only mode leaves them
        (tmp_path / "latest.old").mkdir()
        assert ckpt.resolve_state_dir(target, heal=False) == target
        assert (tmp_path / "latest.old").exists()
        assert ckpt.resolve_state_dir(tmp_path / "absent", heal=False) is None

    def test_saves_serialize_in_order(self, tmp_path):
        order = []
        ev = threading.Event()

        def slow():
            ev.wait(5)
            order.append("first")

        saver = ckpt.AsyncSaver()
        saver._pending = saver._executor.submit(slow)
        t = threading.Thread(
            target=lambda: saver.submit(lambda: order.append("second")))
        t.start()
        time.sleep(0.05)
        ev.set()
        t.join(5)
        saver.close()
        assert order == ["first", "second"]
