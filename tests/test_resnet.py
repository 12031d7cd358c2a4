"""Policy/value ResNet tests: topology, shapes, parameter counts vs the
reference tch net (reference src/alphazero/nnet.rs:56-107)."""

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.envs import backgammon as bg
from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.nets.resnet import (
    PolicyValueNet,
    forward,
    forward_policy,
    forward_train,
    init_params,
    make_net,
)


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class TestShapes:
    def test_ttt_output_shapes(self):
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(0))
        obs = jnp.zeros((5, 3, 3, 3))
        p, v = forward(net, variables, obs)
        assert p.shape == (5, 9) and v.shape == (5, 1)

    def test_backgammon_output_shapes(self):
        # tiny stand-in spec with backgammon obs/action shape to keep CI fast
        import dataclasses

        spec = dataclasses.replace(bg.SPEC, n_filters=16, n_res_blocks=2)
        net = make_net(spec)
        variables = init_params(net, jax.random.PRNGKey(0))
        obs = jnp.zeros((3, 4, 6, 6))
        p, v = forward(net, variables, obs)
        assert p.shape == (3, 1352) and v.shape == (3, 1)

    def test_policy_softmaxed_value_tanh(self):
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(1))
        obs = jax.random.normal(jax.random.PRNGKey(2), (4, 3, 3, 3))
        p, v = forward(net, variables, obs)
        np.testing.assert_allclose(np.asarray(jnp.sum(p, -1)), 1.0, rtol=1e-5)
        assert bool(jnp.all((v >= -1) & (v <= 1)))

    def test_forward_policy_matches_forward(self):
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(1))
        obs = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 3, 3))
        p1, _ = forward(net, variables, obs)
        p2 = forward_policy(net, variables, obs)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


class TestTopology:
    def test_parameter_count_matches_reference_formula(self):
        """Conv/dense/BN parameter count must equal the reference topology
        (nnet.rs:64-98) computed analytically for the TTT consts
        (9 actions / 3 channels / 9 conv-out / 64 filters / 4 blocks,
        reference src/tictactoe/mod.rs:20-24)."""
        f, blocks, a, cin, hw = 64, 4, 9, 3, 9
        conv = lambda ci, co: ci * co * 9 + co
        bn = lambda c: 2 * c  # scale + bias (running stats are state)
        expected = (
            conv(cin, f) + bn(f)
            + blocks * (2 * conv(f, f) + 2 * bn(f))
            + conv(f, 32) + bn(32) + (32 * hw * a + a)
            + conv(f, 3) + bn(3) + (3 * hw * 1 + 1)
        )
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(0))
        assert _n_params(variables["params"]) == expected

    def test_batch_stats_updated_in_train_mode(self):
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(4), (8, 3, 3, 3)) * 3 + 1
        (_, _), mutated = forward_train(net, variables, obs)
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after)
        )

    def test_train_logits_not_softmaxed(self):
        net = make_net(ttt.SPEC)
        variables = init_params(net, jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 3, 3))
        (logits, _), _ = forward_train(net, variables, obs)
        sums = np.asarray(jnp.sum(logits, -1))
        assert not np.allclose(sums, 1.0)


class TestBf16Inference:
    """The inference path runs bf16 compute with f32 params on TPU
    (die_e_tpu/core/mesh.py compute_dtype; the reference is f32 everywhere,
    src/lib.rs:20).  The same f32 variables must serve both nets."""

    def test_bf16_forward_close_to_f32(self):
        import jax.numpy as jnp

        net32 = make_net(ttt.SPEC)
        net16 = make_net(ttt.SPEC, dtype=jnp.bfloat16)
        variables = init_params(net32, jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 3, 3))
        p32, v32 = net32.apply(variables, obs, train=False)
        p16, v16 = net16.apply(variables, obs, train=False)
        assert p16.dtype == jnp.float32  # outputs cast back to f32
        sm32 = np.asarray(jax.nn.softmax(p32, -1))
        sm16 = np.asarray(jax.nn.softmax(p16, -1))
        np.testing.assert_allclose(sm16, sm32, atol=0.05)
        np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                                   atol=0.05)

    def test_compute_dtype_is_f32_off_tpu(self):
        import jax.numpy as jnp

        from die_e_tpu.core.mesh import compute_dtype

        assert compute_dtype() == jnp.float32  # tests force CPU
