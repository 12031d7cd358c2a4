"""Batched NN-guided MCTS (PUCT) fully on device.

TPU-native rebuild of the reference's ``alpha_mcts_parallel``
(reference src/mcts/alpha_mcts.rs:91-202): N lockstep games share one batched
network evaluation per search iteration.  Where the reference walks heap
trees on the CPU and pays 2 host<->device round-trips per iteration
(states up at alpha_mcts.rs:175-183, policy/eval down at :186-190), here
select -> evaluate -> expand -> backprop is one fused jitted loop over the
array tree; nothing leaves the device.

Search semantics mirrored exactly from the reference:

* PUCT score  q + c * sqrt(parent_visits) / (child_visits + 1) * prior with
  q = 0 for unvisited children (alpha_ucb, src/mcts/node.rs:98-112).
* Root: one batched forward_policy, Dirichlet noise on the root priors,
  masked+renormalized expansion, root visits preset to 1
  (alpha_mcts.rs:104-127).
* Per iteration: select leaf, batched forward_t, expand with
  masked+renormalized priors, backprop the tanh value uniformly (no sign
  alternation) up the parent chain (alpha_mcts.rs:149-199 +
  simple_mcts.rs:96-103).
* Terminal leaves backprop +-1 measured against the ROOT player
  (alpha_mcts.rs:157-163).
* Output: root-children visit-count distribution
  (get_prob_tensor_parallel, src/mcts/utils.rs:42-58).

Documented divergences (reference quirks consciously fixed, SURVEY.md
section 7):

* Dirichlet noise is sampled per game over the legal actions only; the
  reference samples ONE noise vector over the full action space shared by
  every game in the batch (noise.rs:27-34).
* Terminal games do not keep re-expanding a stale leaf; the reference
  re-expands the previous selection for finished games every iteration
  (alpha_mcts.rs:142, 175-199).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from die_e_tpu.envs.base import freeze_where
from die_e_tpu.ops.rows import scatter_rows
from die_e_tpu.search.tree import (
    Tree,
    allocate,
    backprop_path,
    children_of,
    init_tree,
    node_field,
    node_onehot,
    prior_row,
    root_visit_probs,
    set_prior_row,
)


@struct.dataclass
class SearchResult:
    visit_probs: jnp.ndarray   # [B, A] normalized root visit counts
    root_value: jnp.ndarray    # [B] mean value at root
    tree: Tree


def _masked_renorm(policy, legal):
    """Zero illegal entries and renormalize rows; illegal slots become the
    -1.0 sentinel (reference turn_policy_to_probs_tensor_parallel,
    src/mcts/utils.rs:60-72)."""
    p = jnp.where(legal, policy, 0.0)
    s = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(s, 1e-30)
    return jnp.where(legal, p, -1.0)


def _dirichlet_legal(rng, alpha, legal):
    """Per-game Dirichlet over the legal actions (fixed quirk; reference
    noise.rs:27-34 shares one full-space vector across the batch)."""
    g = jax.random.gamma(rng, alpha, legal.shape)
    g = jnp.where(legal, g, 0.0)
    return g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)


def select_and_allocate(tree: Tree, env, root_states, c: float,
                        root_player=None):
    """Descend every game from its root by PUCT until an unexpanded node,
    materializing first-visited children on the way (alpha_select_leaf_node,
    src/mcts/alpha_mcts.rs:14-20, with deferred allocation — see tree.py).
    Returns (tree, leaf_idx [B], leaf_states).

    PUCT score q + c * sqrt(parent_visits) / (child_visits + 1) * prior
    (alpha_ucb, src/mcts/node.rs:98-112).  Materialized children are scored
    on [B, N] node arrays (their edge prior was recorded at allocation);
    unmaterialized children have q = 0, visits = 0, so their score is
    c * sqrt(parent_visits) * prior, computed on the [B, A] prior row.

    The current state is CARRIED down the descent and re-stepped with the
    traversed action each level (env.step is deterministic, so this
    reproduces the node's state exactly); the tree stores no states.

    Also returns the [B, N] boolean PATH mask of every node visited on the
    descent (root included) so the caller can backprop with one vectorized
    update (tree.backprop_path) instead of re-walking the parent chain.
    The ``active`` flag is carried rather than recomputed in ``cond``.
    """
    cur0 = jnp.zeros((tree.batch_size,), jnp.int32)

    def expanded_at(tree, cur):
        return node_field(tree, tree.expanded.astype(jnp.int32), cur) > 0

    def cond(carry):
        _, _, _, _, active = carry
        return jnp.any(active)

    def body(carry):
        tree, cur, cur_state, path, active = carry
        p_row = prior_row(tree, cur)                       # [B, A]
        vc = node_field(tree, tree.visits, cur)            # [B]
        explore = c * jnp.sqrt(vc)

        # materialized children: score on [B, N].  In negamax mode the
        # exploitation term is measured from the perspective of the player
        # to move at ``cur`` (values are accumulated in the root player's
        # perspective); the reference maximizes the raw accumulated value
        # at every level (alpha_ucb, node.rs:98-112 + uniform backprop)
        is_child = children_of(tree, cur)
        q = jnp.where(
            tree.visits > 0,
            tree.value_sum / jnp.maximum(tree.visits, 1e-9),
            0.0,
        )
        if root_player is not None:
            cur_player = node_field(tree, tree.node_player, cur)
            sign = (cur_player == root_player).astype(jnp.float32) * 2.0 - 1.0
            q = q * sign[:, None]
        u = explore[:, None] / (tree.visits + 1.0) * tree.edge_prior
        score_n = jnp.where(is_child, q + u, -jnp.inf)
        best_n = jnp.argmax(score_n, axis=-1).astype(jnp.int32)
        best_n_score = jnp.max(score_n, axis=-1)

        # unmaterialized children: score on [B, A].  Materialized actions
        # were marked taken in the prior row at allocation time (the
        # < -1.0 sentinel below), so p_row >= 0 means legal AND
        # unmaterialized — no [B, N, A]-scale reconstruction per level.
        legal_untaken = p_row >= 0.0
        score_a = explore[:, None] * jnp.maximum(p_row, 0.0)
        score_a = jnp.where(legal_untaken, score_a, -jnp.inf)
        best_a = jnp.argmax(score_a, axis=-1).astype(jnp.int32)
        best_a_score = jnp.max(score_a, axis=-1)

        choose_new = best_a_score > best_n_score
        oh_a = best_a[:, None] == jnp.arange(tree.num_actions)[None, :]
        edge_p = jnp.sum(
            jnp.where(oh_a, jnp.maximum(p_row, 0.0), 0.0), axis=-1
        )
        do_alloc = active & choose_new
        # one env.step per level reproduces the next node's state, whether
        # it is the freshly allocated child (action best_a) or an already
        # materialized one (its stored edge action)
        act_n = node_field(tree, tree.action, best_n)
        action_next = jnp.where(choose_new, best_a, act_n)
        next_state = jax.vmap(env.step)(cur_state, action_next)
        tree, new_idx = allocate(
            tree, env, cur, best_a, edge_p, do_alloc, next_state
        )
        # mark the taken action on the parent's prior row in place
        # (-2 - p stays distinguishable from the -1.0 illegal sentinel);
        # a per-row DMA on TPU, so the cost is independent of N
        marked = jnp.where(oh_a, -2.0 - p_row, p_row)
        b = p_row.shape[0]
        a_pad = tree.padded_actions
        row_p = jnp.full((b, a_pad), -1.0, tree.prior.dtype)
        row_p = row_p.at[:, : marked.shape[1]].set(
            marked.astype(tree.prior.dtype)
        )
        row_p = row_p.reshape(b, tree.prior.shape[2], tree.prior.shape[3])
        tree = tree.replace(
            prior=scatter_rows(tree.prior, cur, row_p, do_alloc)
        )
        nxt = jnp.where(choose_new, new_idx, best_n)
        cur = jnp.where(active, nxt, cur)
        cur_state = freeze_where(~active, cur_state, next_state)
        path = path | (node_onehot(tree, cur) & active[:, None])
        active = active & expanded_at(tree, cur)
        return tree, cur, cur_state, path, active

    path0 = node_onehot(tree, cur0)  # root is always on the backprop chain
    active0 = expanded_at(tree, cur0)
    tree, cur, cur_state, path, _ = jax.lax.while_loop(
        cond, body, (tree, cur0, root_states, path0, active0)
    )
    return tree, cur, cur_state, path


def expand(tree: Tree, leaf, prior_rows, mask) -> Tree:
    """Install priors at ``leaf`` and mark expanded (alpha_expand_tensor,
    src/mcts/node.rs:157-174, without materializing the children)."""
    return set_prior_row(tree, leaf, prior_rows, mask)


@partial(jax.jit, static_argnames=("env", "eval_fn", "iterations", "c",
                                   "dirichlet_alpha", "dirichlet_epsilon",
                                   "negamax"))
def alpha_search(
    env,
    eval_fn: Callable[[Any, Any], Any],
    params,
    states,
    rng,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    negamax: bool = False,
) -> SearchResult:
    """Run PUCT search for a batch of root states.

    ``eval_fn(params, obs [B,H,W,C]) -> (policy_softmax [B,A], value [B,1])``
    (reference forward_t, nnet.rs:120-133).  ``eval_fn`` must be a stable
    module-level function (it is a static jit arg); ``params`` is traced so
    weight updates never trigger recompilation.
    """
    tree = init_tree(env, states, capacity=iterations + 1)

    # --- root: batched policy + per-game Dirichlet over legal actions
    # (alpha_mcts_parallel root setup, alpha_mcts.rs:97-127)
    root_obs = jax.vmap(env.observe)(states)
    root_policy, _ = eval_fn(params, root_obs)
    root_legal = jax.vmap(env.legal_mask)(states)
    noise = _dirichlet_legal(rng, dirichlet_alpha, root_legal)
    mixed = (1.0 - dirichlet_epsilon) * root_policy + dirichlet_epsilon * noise
    root_prior = _masked_renorm(mixed, root_legal)
    root_done = tree.node_done[:, 0]
    tree = expand(tree, jnp.zeros_like(tree.node_count), root_prior, ~root_done)
    tree = tree.replace(visits=tree.visits.at[:, 0].set(1.0))
    root_player = jax.vmap(env.player)(states)

    # --- search loop: one batched NN call per iteration
    def body(_, tree):
        tree, leaf, leaf_states, path = select_and_allocate(
            tree, env, states, c, root_player if negamax else None
        )
        obs = jax.vmap(env.observe)(leaf_states)
        policy, value = eval_fn(params, obs)
        legal = jax.vmap(env.legal_mask)(leaf_states)
        prior_rows = _masked_renorm(policy, legal)

        is_term = node_field(tree, tree.node_done.astype(jnp.int32), leaf) > 0
        w = node_field(tree, tree.node_winner, leaf)
        term_val = jnp.where(
            w == root_player, 1.0, jnp.where(w == -root_player, -1.0, 0.0)
        )
        nn_v = value[:, 0]
        if negamax:
            # the value head predicts the outcome from the LEAF player's
            # perspective (training targets are winner*player); convert to
            # the root player's perspective before accumulating
            leaf_player = node_field(tree, tree.node_player, leaf)
            nn_v = nn_v * (leaf_player * root_player).astype(jnp.float32)
        v = jnp.where(is_term, term_val, nn_v)
        tree = expand(tree, leaf, prior_rows, ~is_term)
        return backprop_path(tree, path, v)

    tree = jax.lax.fori_loop(0, iterations, body, tree)
    root_v = tree.value_sum[:, 0] / jnp.maximum(tree.visits[:, 0], 1e-9)
    return SearchResult(
        visit_probs=root_visit_probs(tree), root_value=root_v, tree=tree
    )


def temperature_probs(visit_probs, temperature: float):
    """pi^(1/tau) renormalized (reference temperature sampling,
    src/alphazero/alphazero.rs:129-147 / alpha_parallel.rs:164-166)."""
    p = jnp.power(jnp.maximum(visit_probs, 0.0), 1.0 / temperature)
    s = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.maximum(s, 1e-30)


def sample_action(rng, visit_probs, temperature: float):
    """Weighted sample from the temperature distribution
    (weighted_select_tensor_idx, alphazero.rs:129-137); all-zero rows fall
    back to the last action index which callers must mask by done flags."""
    p = temperature_probs(visit_probs, temperature)
    logits = jnp.where(p > 0, jnp.log(p), -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def get_next_move(
    env,
    eval_fn,
    variables,
    state,
    rng,
    iterations: int = 100,
    c: float = 2.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_epsilon: float = 0.25,
    temperature: float = 1.25,
    negamax: bool = False,
) -> int:
    """Single-state next-move helper for debugging / interactive play
    (reference get_next_move_for_state, src/alphazero/alphazero.rs:139-147):
    a B=1 PUCT search + temperature sample; returns a Python int action
    (the noop action for terminal states, mirroring the reference's None)."""
    states = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
    r_search, r_sample = jax.random.split(rng)
    res = alpha_search(
        env, eval_fn, variables, states, r_search,
        iterations=iterations, c=c,
        dirichlet_alpha=dirichlet_alpha, dirichlet_epsilon=dirichlet_epsilon,
        negamax=negamax,
    )
    action = sample_action(r_sample, res.visit_probs, temperature)
    no_probs = jnp.sum(res.visit_probs, axis=-1) <= 0.0
    action = jnp.where(no_probs, env.spec.noop_action, action)
    return int(action[0])
