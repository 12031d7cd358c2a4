"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md section 4: multi-host tests via
XLA_FLAGS=--xla_force_host_platform_device_count=N, no real pod needed)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from die_e_tpu.core.mesh import DATA_AXIS, make_mesh
from die_e_tpu.envs import backgammon as bg
from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import make_net
from die_e_tpu.parallel.distributed import make_train_mesh, train_iteration
from die_e_tpu.parallel.multihost import process_batch_slice
from die_e_tpu.train.learner import (
    create_train_state,
    make_optimizer,
    net_eval_fn,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_mesh_shapes():
    mesh = make_mesh(8, 1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(3, 1, jax.devices()[:8])


def test_sharded_train_iteration_backgammon():
    """The full fused self-play + update step over the data axis — the
    multi-chip path the driver dry-runs."""
    mesh = make_train_mesh(8, 1, jax.devices()[:8])
    spec = dataclasses.replace(bg.SPEC, n_filters=8, n_res_blocks=1)
    net = make_net(spec)
    tx = make_optimizer()
    state = create_train_state(net, jax.random.PRNGKey(0))
    eval_fn = net_eval_fn(net)

    batch = 16
    init_states = jax.vmap(bg.init)(jnp.arange(batch, dtype=jnp.uint32))
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    init_states = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sh), init_states
    )
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    new_state, metrics = train_iteration(
        bg.ENV, net, tx, eval_fn, state, init_states, jax.random.PRNGKey(1),
        iterations=4, round_limit=4,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["fragments"]) > 0
    # params actually changed
    p0 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(p0)).all()


def test_sharded_matches_single_device():
    """Sharding over the data axis must not change the math: the same fused
    step on a 1-device and an 8-device mesh gives identical loss."""
    spec = dataclasses.replace(ttt.SPEC, n_filters=8, n_res_blocks=1)
    net = make_net(spec)
    tx = make_optimizer()
    eval_fn = net_eval_fn(net)
    batch = 16
    init_states = jax.vmap(ttt.init)(jnp.arange(batch, dtype=jnp.uint32))

    losses = []
    for n_dev in (1, 8):
        mesh = make_train_mesh(n_dev, 1, jax.devices()[:n_dev])
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        st = create_train_state(net, jax.random.PRNGKey(0))
        st = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), st)
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sh), init_states
        )
        _, metrics = train_iteration(
            ttt.ENV, net, tx, eval_fn, st, states, jax.random.PRNGKey(1),
            iterations=4, round_limit=6,
        )
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)


def test_process_batch_slice_partition():
    """Host slices are disjoint, cover the batch, and are independent of
    host count only in the aggregate (single-process: full batch)."""
    s = process_batch_slice(32, seed=0)
    assert s.shape == (32,)  # single process owns the full batch
    s2 = process_batch_slice(32, seed=0)
    np.testing.assert_array_equal(s, s2)
    assert not np.array_equal(s, process_batch_slice(32, seed=1))
