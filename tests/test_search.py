"""Search-layer tests.

Mirrors the reference's tests/mcts_test.rs (policy-masking shape /
normalization cases) and adds what the reference lacks (SURVEY.md section 4):
fixed-seed visit-count determinism and tactical-correctness regressions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from die_e_tpu.envs import tictactoe as ttt
from die_e_tpu.search.alpha import (
    _masked_renorm,
    alpha_search,
    sample_action,
    temperature_probs,
)
from die_e_tpu.search.simple import simple_search
from die_e_tpu.search.tree import init_tree, root_visit_probs


def uniform_eval(params, obs):
    b = obs.shape[0]
    return jnp.ones((b, 9)) / 9.0, jnp.zeros((b, 1))


def batch_ttt(boards, players):
    return ttt.TttState(
        board=jnp.asarray(boards, jnp.int32),
        player=jnp.asarray(players, jnp.int32),
    )


class TestMaskedRenorm:
    """reference tests/mcts_test.rs:16-33: masked policy rows sum to 1."""

    def test_rows_sum_to_one(self):
        rng = jax.random.PRNGKey(0)
        policy = jax.nn.softmax(jax.random.normal(rng, (10, 9)), axis=-1)
        legal = jax.random.bernoulli(rng, 0.5, (10, 9))
        legal = legal.at[:, 0].set(True)  # at least one legal
        out = _masked_renorm(policy, legal)
        sums = jnp.sum(jnp.where(out >= 0, out, 0.0), axis=-1)
        np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)
        assert bool(jnp.all(out[~np.asarray(legal)] == -1.0))

    def test_illegal_get_zero_probability_mass(self):
        policy = jnp.array([[0.5, 0.3, 0.2]])
        legal = jnp.array([[True, False, True]])
        out = _masked_renorm(policy, legal)
        np.testing.assert_allclose(
            np.asarray(out[0]), [0.5 / 0.7, -1.0, 0.2 / 0.7], rtol=1e-5
        )


class TestRootVisitProbs:
    """reference tests/mcts_test.rs:40-60: visit distribution shape +
    normalization over a hand-built tree."""

    def test_shape_and_normalization(self):
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        res = alpha_search(
            ttt.ENV, uniform_eval, None, states, jax.random.PRNGKey(0),
            iterations=100, c=2.0,
        )
        assert res.visit_probs.shape == (4, 9)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(res.visit_probs, -1)), 1.0, rtol=1e-5
        )

    def test_empty_tree_all_zero(self):
        # terminal root -> no children -> all-zero row (reference
        # get_prob_tensor returns None, utils.rs:18-20)
        won = batch_ttt([[-1, -1, -1, 1, 1, 0, 0, 0, 0]], [1])
        tree = init_tree(ttt.ENV, won, capacity=4)
        probs = root_visit_probs(tree)
        assert bool(jnp.all(probs == 0.0))


class TestSimpleSearch:
    def test_finds_immediate_win(self):
        s = batch_ttt([[-1, -1, 0, 1, 1, 0, 0, 0, 0]] * 4, [-1] * 4)
        action, _ = simple_search(
            ttt.ENV, s, jax.random.PRNGKey(1), iterations=200, c=2.0,
            simulate_round_limit=9,
        )
        assert list(np.asarray(action)) == [2, 2, 2, 2]

    def test_blocks_immediate_loss(self):
        # o (+1) to move; x threatens 0-1-2: block at 2
        s = batch_ttt([[-1, -1, 0, 1, 0, 0, 0, 0, 0]] * 4, [1] * 4)
        action, _ = simple_search(
            ttt.ENV, s, jax.random.PRNGKey(2), iterations=200, c=2.0,
            simulate_round_limit=9,
        )
        assert list(np.asarray(action)) == [2, 2, 2, 2]

    def test_deterministic_under_fixed_seed(self):
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        _, p1 = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(7), iterations=200, c=2.0,
            simulate_round_limit=9,
        )
        _, p2 = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(7), iterations=200, c=2.0,
            simulate_round_limit=9,
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_terminal_root_returns_noop(self):
        won = batch_ttt([[-1, -1, -1, 1, 1, 0, 0, 0, 0]] * 4, [1] * 4)
        action, _ = simple_search(
            ttt.ENV, won, jax.random.PRNGKey(0), iterations=200, c=2.0,
            simulate_round_limit=9,
        )
        assert int(action[0]) == ttt.NOOP_ACTION

    def test_hosted_chunked_matches_fused(self):
        """Chunk boundaries carry (tree, rng) across device programs, so
        any chunking computes the bit-identical search."""
        from die_e_tpu.search.simple import simple_search_hosted

        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        a1, p1 = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(11), iterations=20, c=2.0,
            simulate_round_limit=9,
        )
        a2, p2 = simple_search_hosted(
            ttt.ENV, states, jax.random.PRNGKey(11), iterations=20,
            chunk=3, c=2.0, simulate_round_limit=9,
        )
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_rollout_limit_cap_equals_draw_limit_when_equal(self):
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        _, p1 = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(5), iterations=30, c=2.0,
            simulate_round_limit=9,
        )
        _, p2 = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(5), iterations=30, c=2.0,
            simulate_round_limit=9, rollout_limit=9,
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_rollout_limit_truncates_playouts(self):
        # with depth-0 rollouts every simulated value is 0; the search
        # still runs and returns a legal move
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        action, probs = simple_search(
            ttt.ENV, states, jax.random.PRNGKey(6), iterations=30, c=2.0,
            simulate_round_limit=9, rollout_limit=1,
        )
        legal = np.asarray(jax.vmap(ttt.ENV.legal_mask)(states))
        for b, a in enumerate(np.asarray(action)):
            assert legal[b, a]
        assert np.all(np.asarray(probs) >= 0.0)


class TestAlphaSearch:
    def test_finds_immediate_win(self):
        s = batch_ttt([[-1, -1, 0, 1, 1, 0, 0, 0, 0]] * 4, [-1] * 4)
        res = alpha_search(
            ttt.ENV, uniform_eval, None, s, jax.random.PRNGKey(3),
            iterations=100, c=2.0,
        )
        assert list(np.asarray(jnp.argmax(res.visit_probs, -1))) == [2, 2, 2, 2]

    def test_visit_counts_deterministic(self):
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        r1 = alpha_search(
            ttt.ENV, uniform_eval, None, states, jax.random.PRNGKey(5),
            iterations=100, c=2.0,
        )
        r2 = alpha_search(
            ttt.ENV, uniform_eval, None, states, jax.random.PRNGKey(5),
            iterations=100, c=2.0,
        )
        np.testing.assert_array_equal(
            np.asarray(r1.visit_probs), np.asarray(r2.visit_probs)
        )

    def test_priors_only_on_legal_moves(self):
        s = batch_ttt([[-1, 1, 0, 0, 0, 0, 0, 0, 0]] * 4, [-1] * 4)
        res = alpha_search(
            ttt.ENV, uniform_eval, None, s, jax.random.PRNGKey(0),
            iterations=100, c=2.0,
        )
        # occupied cells never receive visits
        assert float(res.visit_probs[0, 0]) == 0.0
        assert float(res.visit_probs[0, 1]) == 0.0

    def test_node_budget_respected(self):
        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        res = alpha_search(
            ttt.ENV, uniform_eval, None, states, jax.random.PRNGKey(0),
            iterations=100, c=2.0,
        )
        assert bool(jnp.all(res.tree.node_count <= 101))


class TestTemperature:
    def test_temperature_one_identity(self):
        p = jnp.array([[0.5, 0.25, 0.25]])
        np.testing.assert_allclose(
            np.asarray(temperature_probs(p, 1.0)), np.asarray(p), rtol=1e-6
        )

    def test_low_temperature_sharpens(self):
        p = jnp.array([[0.5, 0.3, 0.2]])
        out = temperature_probs(p, 0.1)
        assert float(out[0, 0]) > 0.95

    def test_sample_action_respects_support(self):
        p = jnp.array([[0.0, 1.0, 0.0]] * 8)
        a = sample_action(jax.random.PRNGKey(0), p, 1.25)
        assert list(np.asarray(a)) == [1] * 8


class TestWinPctSelection:
    """select_win_pct final-move mode (simple_mcts.rs:54-69 via win_pct,
    node.rs:114-116): argmax of root-child mean values."""

    def test_win_pct_finds_immediate_win(self):
        s = batch_ttt([[-1, -1, 0, 1, 1, 0, 0, 0, 0]] * 4, [-1] * 4)
        action, _ = simple_search(
            ttt.ENV, s, jax.random.PRNGKey(1), iterations=200, c=2.0,
            simulate_round_limit=9, selection="win_pct",
        )
        assert list(np.asarray(action)) == [2, 2, 2, 2]

    def test_win_pct_terminal_root_returns_noop(self):
        won = batch_ttt([[-1, -1, -1, 1, 1, 0, 0, 0, 0]] * 2, [1] * 2)
        action, _ = simple_search(
            ttt.ENV, won, jax.random.PRNGKey(0), iterations=50, c=2.0,
            simulate_round_limit=9, selection="win_pct",
        )
        assert int(action[0]) == ttt.NOOP_ACTION

    def test_win_pct_matches_root_q_argmax(self):
        from die_e_tpu.search.tree import root_q_values

        states = jax.vmap(ttt.init)(jnp.arange(4, dtype=jnp.uint32))
        res = alpha_search(
            ttt.ENV, uniform_eval, None, states, jax.random.PRNGKey(5),
            iterations=64, c=2.0,
        )
        q = np.asarray(root_q_values(res.tree))
        # every legal root action got materialized at 64 sims on TTT,
        # so finite q exactly on the legal set
        legal = np.asarray(jax.vmap(ttt.ENV.legal_mask)(states))
        assert (np.isfinite(q) == legal).all()

    def test_unknown_selection_raises(self):
        states = jax.vmap(ttt.init)(jnp.arange(2, dtype=jnp.uint32))
        with pytest.raises(ValueError):
            simple_search(ttt.ENV, states, jax.random.PRNGKey(0),
                          iterations=4, selection="nope")


class TestGetNextMove:
    """Single-state helper (get_next_move_for_state, alphazero.rs:139-147)."""

    def test_returns_winning_move(self):
        from die_e_tpu.search.alpha import get_next_move

        state = ttt.TttState(
            board=jnp.asarray([-1, -1, 0, 1, 1, 0, 0, 0, 0], jnp.int32),
            player=jnp.int32(-1),
        )
        a = get_next_move(
            ttt.ENV, uniform_eval, None, state, jax.random.PRNGKey(0),
            iterations=100, temperature=0.1,
        )
        assert a == 2

    def test_terminal_state_returns_noop(self):
        from die_e_tpu.search.alpha import get_next_move

        state = ttt.TttState(
            board=jnp.asarray([-1, -1, -1, 1, 1, 0, 0, 0, 0], jnp.int32),
            player=jnp.int32(1),
        )
        a = get_next_move(ttt.ENV, uniform_eval, None, state,
                          jax.random.PRNGKey(0), iterations=16)
        assert a == ttt.NOOP_ACTION
