"""Batched pure-rollout MCTS (UCB1 + random playouts) on device.

TPU-native rebuild of the reference's ``mct_search``
(reference src/mcts/simple_mcts.rs:10-39): select a leaf by UCB1, expand one
child per iteration, evaluate it with a uniformly random rollout capped at
``simulate_round_limit``, and backpropagate; the final move is the root child
with most visits (select_most_visits, simple_mcts.rs:71-86).  The reference
runs one tree per CPU thread via rayon (src/versus.rs:303-306); here all B
games run in lockstep as array-tree ops under jit (see tree.py for the
node-matching layout that avoids dynamic gathers).

Semantics mirrored exactly:

* UCB1 score  value/visits + sqrt(c * ln(parent_visits) / visits)
  (node.rs:86-96).
* A node is a selection leaf while it has unexpanded moves or no children
  (select_leaf_node, simple_mcts.rs:88-94).
* One child expanded per iteration, taken from the END of the legal-move
  list (expandable_moves.pop(), node.rs:118-137) — here: the highest
  remaining legal action index.
* Terminal leaves backprop the winner scored against the search player
  (mct_search, simple_mcts.rs:21-28).

Documented divergences (reference quirks consciously fixed, SURVEY.md
section 7):

* the rollout checks the winner of the EVOLVING playout state each step;
  the reference checks the never-changing start state (node.rs:181), so its
  rollouts always run to the round limit and return 0.
* the UCB exploitation term is sign-flipped at opponent decision nodes;
  the reference maximizes the root player's accumulated value at EVERY
  level, so its opponents cooperate and it cannot block threats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from die_e_tpu.envs.base import freeze_where
from die_e_tpu.search.tree import (
    Tree,
    allocate,
    backprop_path,
    children_of,
    init_tree,
    node_field,
    node_onehot,
    prior_row,
    root_q_values,
    root_visit_probs,
    set_prior_row,
)


def _legal_rows(env, states):
    """[B, A] legality encoded in the prior slot: 1.0 legal / -1.0 illegal."""
    legal = jax.vmap(env.legal_mask)(states)
    return jnp.where(legal, 1.0, -1.0)


def _select_leaf(tree: Tree, env, root_states, c: float, root_player):
    """Descend by UCB1 until a node with unexpanded moves (or terminal).
    All scoring happens on [B, N] node arrays via the parent==cur match;
    the current state is carried and re-stepped per level (the tree stores
    no states — see tree.py).  Returns (leaf_idx [B], leaf_states,
    path [B, N]) where ``path`` flags every node on the root->leaf descent
    for the one-shot vectorized backprop (tree.backprop_path)."""
    cur0 = jnp.zeros((tree.batch_size,), jnp.int32)

    def fully_expanded(tree, cur):
        nl = node_field(tree, tree.num_legal, cur)
        ne = node_field(tree, tree.num_expanded, cur)
        done = node_field(tree, tree.node_done.astype(jnp.int32), cur) > 0
        return (nl > 0) & (ne >= nl) & (~done)

    def cond(carry):
        _, _, _, active = carry
        return jnp.any(active)

    def body(carry):
        cur, cur_state, path, active = carry
        cur_player = node_field(tree, tree.node_player, cur)
        sign = (cur_player == root_player).astype(jnp.float32) * 2.0 - 1.0
        pv = jnp.maximum(node_field(tree, tree.visits, cur), 1.0)

        is_child = children_of(tree, cur)
        cv = jnp.maximum(tree.visits, 1e-9)
        exploit = sign[:, None] * tree.value_sum / cv
        explore = jnp.sqrt(c * jnp.log(pv)[:, None] / cv)
        score_n = jnp.where(is_child, exploit + explore, -jnp.inf)
        nxt = jnp.argmax(score_n, axis=-1).astype(jnp.int32)
        act_n = node_field(tree, tree.action, nxt)
        next_state = jax.vmap(env.step)(cur_state, act_n)
        cur = jnp.where(active, nxt, cur)
        cur_state = freeze_where(~active, cur_state, next_state)
        path = path | (node_onehot(tree, cur) & active[:, None])
        active = active & fully_expanded(tree, cur)
        return cur, cur_state, path, active

    path0 = node_onehot(tree, cur0)  # root is always on the backprop chain
    active0 = fully_expanded(tree, cur0)
    cur, cur_state, path, _ = jax.lax.while_loop(
        cond, body, (cur0, root_states, path0, active0)
    )
    return cur, cur_state, path


def _next_expand_action(tree: Tree, cur):
    """The num_expanded-th legal action in DESCENDING index order — the
    reference pops from the end of get_valid_moves()
    (expandable_moves.pop(), node.rs:121)."""
    legal = prior_row(tree, cur) >= 0.0  # [B, A]
    # rank_from_top[a] = number of legal actions with index > a
    rev_cum = jnp.cumsum(legal[:, ::-1], axis=-1)[:, ::-1]
    rank_from_top = rev_cum - legal.astype(rev_cum.dtype)
    k = node_field(tree, tree.num_expanded, cur)[:, None]
    pick = legal & (rank_from_top == k)
    return jnp.argmax(pick, axis=-1).astype(jnp.int32), jnp.any(pick, axis=-1)


def _rollout(env, states, rng, player, sim_limit: int):
    """Uniform random playout value vs ``player`` (simulate, node.rs:176-196;
    evolving-state winner check is the documented fix).  Returns [B] in
    {-1, 0, +1}; 0 at the round limit (draw)."""

    def cond(carry):
        _, _, done, step = carry
        return (step < sim_limit) & ~jnp.all(done)

    def body(carry):
        states, rng, done, step = carry
        rng, sub = jax.random.split(rng)
        legal = jax.vmap(env.legal_mask)(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        action = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        next_states = jax.vmap(env.step)(states, action)
        states = freeze_where(done, states, next_states)
        done = done | jax.vmap(env.done)(states)
        return states, rng, done, step + 1

    done0 = jax.vmap(env.done)(states)
    states, _, done, _ = jax.lax.while_loop(
        cond, body, (states, rng, done0, jnp.int32(0))
    )
    w = jax.vmap(env.winner)(states)
    return jnp.where(
        w == player, 1.0, jnp.where(w == -player, -1.0, 0.0)
    ) * done.astype(jnp.float32)


def _iteration_body(env, c, sim_limit, player, root_states, carry):
    """One select/expand/rollout/backprop iteration (mct_search's loop body,
    simple_mcts.rs:10-39) over the carried (tree, rng)."""
    tree, rng = carry
    rng, r_expand = jax.random.split(rng)
    leaf, leaf_states, path = _select_leaf(tree, env, root_states, c, player)
    is_term = node_field(tree, tree.node_done.astype(jnp.int32), leaf) > 0
    w = node_field(tree, tree.node_winner, leaf)
    term_val = jnp.where(w == player, 1.0, jnp.where(w == -player, -1.0, 0.0))

    # expand one child for non-terminal leaves (node.rs:118-137)
    action, can_expand = _next_expand_action(tree, leaf)
    do_expand = can_expand & ~is_term
    child_states = jax.vmap(env.step)(leaf_states, action)
    tree, new_idx = allocate(
        tree, env, leaf, action, jnp.zeros_like(term_val), do_expand,
        child_states,
    )
    oh_leaf = leaf[:, None] == jnp.arange(tree.capacity)[None, :]
    tree = tree.replace(
        num_expanded=tree.num_expanded
        + (oh_leaf & do_expand[:, None]).astype(jnp.int32)
    )
    # record the new node's legality for its own later expansion;
    # the evaluated state is the fresh child where one was expanded,
    # else the (terminal/full) leaf itself
    target = jnp.where(do_expand, new_idx, leaf)
    new_states = freeze_where(do_expand, child_states, leaf_states)
    tree = set_prior_row(tree, target, _legal_rows(env, new_states), do_expand)

    # evaluate: rollout from the new child, or terminal value at leaf
    sim_val = _rollout(env, new_states, r_expand, player, sim_limit)
    value = jnp.where(is_term, term_val, sim_val)
    # backprop chain = the select path, plus the freshly expanded child
    # where one was created (it heads the chain, node.rs:118-137 semantics)
    oh_new = node_onehot(tree, new_idx) & do_expand[:, None]
    tree = backprop_path(tree, path | oh_new, value)
    return tree, rng


@partial(jax.jit, static_argnames=("env", "capacity"))
def simple_search_init(env, states, capacity: int):
    """Allocate the tree and record root legality; returns (tree, player)."""
    tree = init_tree(env, states, capacity=capacity)
    tree = set_prior_row(
        tree,
        jnp.zeros((tree.batch_size,), jnp.int32),
        _legal_rows(env, states),
        jnp.ones((tree.batch_size,), bool),
    )
    return tree, jax.vmap(env.player)(states)


@partial(jax.jit, static_argnames=("env", "n_iters", "c", "rollout_limit"))
def simple_search_chunk(env, tree, root_states, rng, player, n_iters: int,
                        c: float, rollout_limit: int):
    """Run ``n_iters`` search iterations; the (tree, rng) carry crosses
    device-program boundaries, so callers can bound any single XLA
    execution (the axon tunnel kills programs over ~20-45 s) by chaining
    chunks — chunk boundaries don't change the rng sequence, so any
    chunking computes the identical search."""
    body = partial(_iteration_body, env, c, rollout_limit, player, root_states)
    return jax.lax.fori_loop(0, n_iters, lambda i, cr: body(cr), (tree, rng))


@partial(jax.jit, static_argnames=("env", "selection"))
def simple_search_select(env, tree, selection: str = "most_visits"):
    """Final-move rule over the finished tree: ``"most_visits"`` is argmax
    visits (select_most_visits, simple_mcts.rs:71-86, the reference's
    default); ``"win_pct"`` is argmax mean child value (select_win_pct via
    win_pct, simple_mcts.rs:54-69 + node.rs:114-116).  Terminal roots
    return the noop action (mct_search's EMPTY_MOVE early-out,
    simple_mcts.rs:12-14)."""
    probs = root_visit_probs(tree)
    if selection == "win_pct":
        q = root_q_values(tree)  # -inf where the root has no child
        action = jnp.argmax(q, axis=-1).astype(jnp.int32)
    else:
        action = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    root_terminal = tree.node_done[:, 0]
    action = jnp.where(root_terminal, env.spec.noop_action, action)
    return action, probs


def _check_args(selection, rollout_limit, simulate_round_limit):
    if selection not in ("most_visits", "win_pct"):
        raise ValueError(f"unknown selection mode {selection!r}")
    return rollout_limit if rollout_limit is not None else simulate_round_limit


@partial(jax.jit, static_argnames=("env", "iterations", "c",
                                   "simulate_round_limit", "selection",
                                   "rollout_limit"))
def simple_search(
    env,
    states,
    rng,
    iterations: int = 100,
    c: float = 2.0,
    simulate_round_limit: int = 400,
    selection: str = "most_visits",
    rollout_limit: int | None = None,
):
    """Pure-rollout MCTS over a batch of root states; returns
    (action [B], visit_probs [B, A]).

    ``rollout_limit`` caps playout depth separately from the draw limit
    (default: ``simulate_round_limit``, the reference's single knob,
    node.rs:176-196); truncated playouts score 0 like round-limit draws.
    A small cap bounds the sequential work per search — this is strictly
    deeper than the reference, whose rollouts ALWAYS return 0 (the
    stale-winner-check quirk documented above).
    """
    limit = _check_args(selection, rollout_limit, simulate_round_limit)
    tree, player = simple_search_init(env, states, capacity=iterations + 1)
    tree, _ = simple_search_chunk(
        env, tree, states, rng, player, n_iters=iterations, c=c,
        rollout_limit=limit,
    )
    return simple_search_select(env, tree, selection)


def simple_search_hosted(
    env,
    states,
    rng,
    iterations: int = 100,
    chunk: int = 25,
    c: float = 2.0,
    simulate_round_limit: int = 400,
    selection: str = "most_visits",
    rollout_limit: int | None = None,
):
    """``simple_search`` split into ceil(iterations/chunk) device programs.

    Bit-identical to the fused search (the rng is carried through the
    chunk boundary), but no single XLA execution runs more than
    ``chunk * (rollout_limit + tree depth)`` env steps — required for pure
    -MCTS arena opponents under the tunnel's program-duration limit."""
    limit = _check_args(selection, rollout_limit, simulate_round_limit)
    tree, player = simple_search_init(env, states, capacity=iterations + 1)
    done = 0
    while done < iterations:
        n = min(chunk, iterations - done)
        tree, rng = simple_search_chunk(
            env, tree, states, rng, player, n_iters=n, c=c,
            rollout_limit=limit,
        )
        done += n
    return simple_search_select(env, tree, selection)
