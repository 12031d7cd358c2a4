"""Batched pure-rollout MCTS (UCB1 + random playouts) on device.

TPU-native rebuild of the reference's ``mct_search``
(reference src/mcts/simple_mcts.rs:10-39): select a leaf by UCB1, expand one
child per iteration, evaluate it with a uniformly random rollout capped at
``simulate_round_limit``, and backpropagate; the final move is the root child
with most visits (select_most_visits, simple_mcts.rs:71-86).  The reference
runs one tree per CPU thread via rayon (src/versus.rs:303-306); here all B
games run in lockstep as array-tree ops under jit.

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

Documented divergence (reference quirk consciously fixed, SURVEY.md
section 7): the rollout checks the winner of the EVOLVING playout state each
step; the reference checks the never-changing start state (node.rs:181), so
its rollouts always run to the round limit and return 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from die_e_tpu.search.tree import (
    UNVISITED,
    Tree,
    allocate,
    backprop,
    gather_states,
    init_tree,
    root_visit_probs,
)


def _legal_row(env, states):
    """[B, A] legality encoded in the prior slot: 1.0 legal / -1.0 illegal."""
    legal = jax.vmap(env.legal_mask)(states)
    return jnp.where(legal, 1.0, -1.0)


def ucb_scores(tree: Tree, cur, c: float, sign):
    """[B, A] UCB1 of ``cur``'s children (node.rs:86-96); only meaningful on
    created children (others -inf).

    ``sign`` [B] is +1 when the player to move at ``cur`` is the search
    (root) player, -1 otherwise.  Documented divergence (quirk consciously
    fixed): values are accumulated from the root player's perspective with
    uniform backprop (simple_mcts.rs:96-103), and the reference maximizes
    them at EVERY level — opponent decision nodes cooperate with the root
    player, so the reference's pure MCTS cannot block threats.  Flipping the
    exploitation term at opponent nodes restores minimax play.
    """
    b = jnp.arange(tree.batch_size)
    child = tree.children[b, cur]
    created = child != UNVISITED
    cidx = jnp.clip(child, 0)
    cv = jnp.where(created, tree.visits[b[:, None], cidx], 1.0)
    cs = jnp.where(created, tree.value_sum[b[:, None], cidx], 0.0)
    exploit = sign[:, None] * cs / jnp.maximum(cv, 1e-9)
    pv = jnp.maximum(tree.visits[b, cur], 1.0)[:, None]
    explore = jnp.sqrt(c * jnp.log(pv) / jnp.maximum(cv, 1e-9))
    return jnp.where(created, exploit + explore, -jnp.inf)


def _num_legal(tree: Tree, cur):
    b = jnp.arange(tree.batch_size)
    return jnp.sum(tree.prior[b, cur] >= 0.0, axis=-1).astype(jnp.int32)


def _select_leaf(tree: Tree, env, c: float, root_player):
    """Descend by UCB1 until a node with unexpanded moves (or terminal)."""
    b = jnp.arange(tree.batch_size)
    cur0 = jnp.zeros((tree.batch_size,), jnp.int32)

    def fully_expanded(tree, cur):
        nl = _num_legal(tree, cur)
        return (nl > 0) & (tree.num_expanded[b, cur] >= nl) & (
            ~tree.node_done[b, cur]
        )

    def cond(carry):
        tree, cur = carry
        return jnp.any(fully_expanded(tree, cur))

    def body(carry):
        tree, cur = carry
        active = fully_expanded(tree, cur)
        cur_player = jax.vmap(env.player)(gather_states(tree, cur))
        sign = (cur_player == root_player).astype(jnp.float32) * 2.0 - 1.0
        a_star = jnp.argmax(
            ucb_scores(tree, cur, c, sign), axis=-1
        ).astype(jnp.int32)
        nxt = tree.children[b, cur, a_star]
        cur = jnp.where(active & (nxt != UNVISITED), nxt, cur)
        return tree, cur

    _, cur = jax.lax.while_loop(cond, body, (tree, cur0))
    return cur


def _next_expand_action(tree: Tree, cur):
    """The num_expanded-th legal action in DESCENDING index order — the
    reference pops from the end of get_valid_moves()
    (expandable_moves.pop(), node.rs:121)."""
    b = jnp.arange(tree.batch_size)
    legal = tree.prior[b, cur] >= 0.0  # [B, A]
    # rank_from_top[a] = number of legal actions with index > a
    rev_cum = jnp.cumsum(legal[:, ::-1], axis=-1)[:, ::-1]
    rank_from_top = rev_cum - legal.astype(rev_cum.dtype)
    k = tree.num_expanded[b, cur][:, None]
    pick = legal & (rank_from_top == k)
    return jnp.argmax(pick, axis=-1).astype(jnp.int32), jnp.any(pick, axis=-1)


def _rollout(env, states, rng, player, sim_limit: int):
    """Uniform random playout value vs ``player`` (simulate, node.rs:176-196;
    evolving-state winner check is the documented fix).  Returns [B] in
    {-1, 0, +1}; 0 at the round limit (draw)."""
    b_shape = jax.vmap(env.player)(states).shape

    def cond(carry):
        _, _, done, step = carry
        return (step < sim_limit) & ~jnp.all(done)

    def body(carry):
        states, rng, done, step = carry
        rng, sub = jax.random.split(rng)
        legal = jax.vmap(env.legal_mask)(states)
        logits = jnp.where(legal, 0.0, -jnp.inf)
        action = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        # noop layering: a game with no legal action has the noop bit set by
        # the env (backgammon) or is terminal (ttt); frozen games keep state
        next_states = jax.vmap(env.step)(states, action)
        states = jax.tree_util.tree_map(
            lambda old, new: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (old.ndim - 1)), old, new
            ),
            states,
            next_states,
        )
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


@partial(jax.jit, static_argnames=("env", "iterations", "c", "simulate_round_limit"))
def simple_search(
    env,
    states,
    rng,
    iterations: int = 100,
    c: float = 2.0,
    simulate_round_limit: int = 400,
):
    """Pure-rollout MCTS over a batch of root states; returns
    (action [B], visit_probs [B, A]).  Action is argmax visits
    (select_most_visits, simple_mcts.rs:71-86); terminal roots return the
    noop action (mct_search's EMPTY_MOVE early-out, simple_mcts.rs:12-14).
    """
    b = jnp.arange(jax.tree_util.tree_leaves(states)[0].shape[0])
    tree = init_tree(env, states, capacity=iterations + 1)
    root = jnp.zeros_like(tree.node_count)
    tree = tree.replace(prior=tree.prior.at[:, 0].set(_legal_row(env, states)))
    player = jax.vmap(env.player)(states)

    def body(i, carry):
        tree, rng = carry
        rng, r_expand = jax.random.split(rng)
        leaf = _select_leaf(tree, env, c, player)
        is_term = tree.node_done[b, leaf]
        w = tree.node_winner[b, leaf]
        term_val = jnp.where(w == player, 1.0, jnp.where(w == -player, -1.0, 0.0))

        # expand one child for non-terminal leaves (node.rs:118-137)
        action, can_expand = _next_expand_action(tree, leaf)
        do_expand = can_expand & ~is_term
        tree, new_idx = allocate(tree, env, leaf, action, do_expand)
        safe = jnp.where(do_expand, leaf, jnp.int32(2**30))
        tree = tree.replace(
            num_expanded=tree.num_expanded.at[b, safe].add(1, mode="drop")
        )
        # record the new node's legality for its own later expansion
        new_states = gather_states(tree, jnp.where(do_expand, new_idx, leaf))
        row = _legal_row(env, new_states)
        safe_new = jnp.where(do_expand, new_idx, jnp.int32(2**30))
        tree = tree.replace(prior=tree.prior.at[b, safe_new].set(row, mode="drop"))

        # evaluate: rollout from the new child, or terminal value at leaf
        sim_val = _rollout(env, new_states, r_expand, player, simulate_round_limit)
        value = jnp.where(is_term, term_val, sim_val)
        start = jnp.where(do_expand, new_idx, leaf)
        tree = backprop(tree, start, value)
        return tree, rng

    tree, _ = jax.lax.fori_loop(0, iterations, body, (tree, rng))

    probs = root_visit_probs(tree)
    action = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    root_terminal = tree.node_done[:, 0]
    action = jnp.where(root_terminal, env.spec.noop_action, action)
    return action, probs
