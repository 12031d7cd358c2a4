"""Batched array MCTS tree (mctx-style), fully on device.

TPU-native replacement for the reference's heap tree: ``Node`` structs
(reference src/mcts/node.rs:9-19) in a flat ``NodeStore`` arena
(reference src/mcts/node_store.rs:9-94) walked on the CPU with per-iteration
host<->device round-trips (reference src/mcts/alpha_mcts.rs:149-200).  Here
the whole search state is a stack of ``[B, N]`` / ``[B, N, A]`` device arrays
over B lockstep games with node capacity N, so select/expand/backprop are
fused into one jitted loop with zero host traffic.

Key structural difference vs the reference: the reference materializes every
legal child as a Node at expansion (alpha_expand, node.rs:139-174) — hundreds
of heap nodes per expansion for backgammon.  Here children statistics live on
the parent's edges (``prior``/``children`` tables); a node is materialized
only when first *visited*, so capacity ``N = iterations + 1`` suffices and
HBM stays bounded.  Search semantics (PUCT scores, visit counts) are
unchanged because an unvisited reference child always has visits=0, value=0.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

NO_PARENT = jnp.int32(-1)
UNVISITED = jnp.int32(-1)


@struct.dataclass
class Tree:
    """Stacked search tree over B games, N node slots, A actions.

    prior[b, n, a] is the masked+renormalized policy prior of action ``a`` at
    node ``n`` (reference turn_policy_to_probs_tensor_parallel semantics,
    src/mcts/utils.rs:60-72) with the sentinel -1.0 marking illegal actions;
    it is only meaningful once ``expanded[b, n]``.  For the pure-rollout
    search (no NN priors) the same slot stores legality (1.0 legal / -1.0
    illegal).
    """

    parent: jnp.ndarray       # [B, N] i32, NO_PARENT for root
    action: jnp.ndarray       # [B, N] i32 action leading here from parent
    children: jnp.ndarray     # [B, N, A] i32 node index, UNVISITED if none
    prior: jnp.ndarray        # [B, N, A] f32, -1.0 = illegal
    visits: jnp.ndarray       # [B, N] f32
    value_sum: jnp.ndarray    # [B, N] f32
    expanded: jnp.ndarray     # [B, N] bool
    node_done: jnp.ndarray    # [B, N] bool — game over at this node
    node_winner: jnp.ndarray  # [B, N] i32 — winner at this node (0 = none/draw)
    num_expanded: jnp.ndarray  # [B, N] i32 — children created (rollout search)
    node_count: jnp.ndarray   # [B] i32 — allocated nodes per game
    states: Any               # env-state pytree, leaves [B, N, ...]

    @property
    def batch_size(self):
        return self.parent.shape[0]

    @property
    def capacity(self):
        return self.parent.shape[1]

    @property
    def num_actions(self):
        return self.children.shape[2]


def init_tree(env, states, capacity: int) -> Tree:
    """Preallocate the tree with root nodes (slot 0) holding ``states``
    (leaves of the batched env-state pytree, leading dim B)."""
    first = jax.tree_util.tree_leaves(states)[0]
    b = first.shape[0]
    n = capacity
    a = env.spec.num_actions

    def alloc(leaf):
        out = jnp.zeros((b, n) + leaf.shape[1:], leaf.dtype)
        return out.at[:, 0].set(leaf)

    stacked = jax.tree_util.tree_map(alloc, states)
    done = jax.vmap(env.done)(states)
    winner = jax.vmap(env.winner)(states)
    return Tree(
        parent=jnp.full((b, n), NO_PARENT),
        action=jnp.full((b, n), jnp.int32(-1)),
        children=jnp.full((b, n, a), UNVISITED),
        prior=jnp.full((b, n, a), -1.0, jnp.float32),
        visits=jnp.zeros((b, n), jnp.float32),
        value_sum=jnp.zeros((b, n), jnp.float32),
        expanded=jnp.zeros((b, n), bool),
        node_done=jnp.zeros((b, n), bool).at[:, 0].set(done),
        node_winner=jnp.zeros((b, n), jnp.int32).at[:, 0].set(winner),
        num_expanded=jnp.zeros((b, n), jnp.int32),
        node_count=jnp.ones((b,), jnp.int32),
        states=stacked,
    )


def gather_states(tree: Tree, idx):
    """states of node ``idx`` [B] -> pytree with leaves [B, ...]."""
    b = jnp.arange(tree.batch_size)
    return jax.tree_util.tree_map(lambda leaf: leaf[b, idx], tree.states)


def write_states(tree_states, b_idx, node_idx, new_states, mask):
    """Scatter ``new_states`` into slot ``node_idx`` for games where ``mask``;
    masked-off games write out of bounds and are dropped."""
    safe_idx = jnp.where(mask, node_idx, jnp.int32(2**30))
    return jax.tree_util.tree_map(
        lambda leaf, s: leaf.at[b_idx, safe_idx].set(s, mode="drop"),
        tree_states,
        new_states,
    )


def allocate(tree: Tree, env, parent_idx, action_idx, mask) -> tuple:
    """Materialize the child reached from ``parent_idx`` via ``action_idx``
    for games where ``mask``; returns (tree, new_node_idx [B]).

    Equivalent to the reference's NodeStore::add_node at first visit
    (node_store.rs:24-43) — but deferred to selection time (see module doc).
    """
    b = jnp.arange(tree.batch_size)
    new_idx = tree.node_count
    parent_states = gather_states(tree, parent_idx)
    child_states = jax.vmap(env.step)(parent_states, action_idx)
    done = jax.vmap(env.done)(child_states)
    winner = jax.vmap(env.winner)(child_states)
    safe = jnp.where(mask, new_idx, jnp.int32(2**30))
    tree = tree.replace(
        parent=tree.parent.at[b, safe].set(parent_idx, mode="drop"),
        action=tree.action.at[b, safe].set(action_idx, mode="drop"),
        children=tree.children.at[b, parent_idx, action_idx].set(
            jnp.where(mask, new_idx, tree.children[b, parent_idx, action_idx])
        ),
        node_done=tree.node_done.at[b, safe].set(done, mode="drop"),
        node_winner=tree.node_winner.at[b, safe].set(winner, mode="drop"),
        node_count=tree.node_count + mask.astype(jnp.int32),
        states=write_states(tree.states, b, new_idx, child_states, mask),
    )
    return tree, new_idx


def backprop(tree: Tree, leaf_idx, value, mask=None) -> Tree:
    """Add ``value`` and one visit to every node on the leaf->root chain.

    Mirrors the reference's backpropagate (src/mcts/simple_mcts.rs:96-103):
    the SAME value is added at every level — no sign alternation — which is
    the reference's (non-negamax) semantics, kept for learning-curve parity.
    """
    b = jnp.arange(tree.batch_size)
    if mask is None:
        mask = jnp.ones((tree.batch_size,), bool)

    def cond(carry):
        _, _, cur, active = carry
        return jnp.any(active)

    def body(carry):
        visits, value_sum, cur, active = carry
        safe = jnp.where(active, cur, jnp.int32(2**30))
        visits = visits.at[b, safe].add(1.0, mode="drop")
        value_sum = value_sum.at[b, safe].add(value, mode="drop")
        nxt = tree.parent[b, jnp.clip(cur, 0)]
        active = active & (nxt != NO_PARENT)
        return visits, value_sum, jnp.where(active, nxt, cur), active

    visits, value_sum, _, _ = jax.lax.while_loop(
        cond, body, (tree.visits, tree.value_sum, leaf_idx, mask)
    )
    return tree.replace(visits=visits, value_sum=value_sum)


def root_visit_probs(tree: Tree) -> jnp.ndarray:
    """[B, A] root-children visit-count distribution (reference
    get_prob_tensor_parallel, src/mcts/utils.rs:42-58).  All-zero rows mean
    the root had no children (terminal root), matching the reference's None.
    """
    b = jnp.arange(tree.batch_size)[:, None]
    child = tree.children[:, 0, :]  # [B, A]
    counts = jnp.where(child != UNVISITED, tree.visits[b, jnp.clip(child, 0)], 0.0)
    total = jnp.sum(counts, axis=-1, keepdims=True)
    return jnp.where(total > 0, counts / jnp.maximum(total, 1e-9), 0.0)


def root_q_values(tree: Tree) -> jnp.ndarray:
    """[B, A] root-children mean values (reference win_pct, node.rs:114-116 —
    used by select_win_pct, simple_mcts.rs:54-69)."""
    b = jnp.arange(tree.batch_size)[:, None]
    child = tree.children[:, 0, :]
    cv = jnp.where(child != UNVISITED, tree.visits[b, jnp.clip(child, 0)], 0.0)
    cs = jnp.where(child != UNVISITED, tree.value_sum[b, jnp.clip(child, 0)], 0.0)
    return jnp.where(cv > 0, cs / jnp.maximum(cv, 1e-9), -jnp.inf)
