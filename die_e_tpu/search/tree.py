"""Batched array MCTS tree (mctx-style), fully on device.

TPU-native replacement for the reference's heap tree: ``Node`` structs
(reference src/mcts/node.rs:9-19) in a flat ``NodeStore`` arena
(reference src/mcts/node_store.rs:9-94) walked on the CPU with per-iteration
host<->device round-trips (reference src/mcts/alpha_mcts.rs:149-200).  Here
the whole search state is a stack of ``[B, N]`` device arrays over B
lockstep games with node capacity N, so select/expand/backprop are fused
into one jitted loop with zero host traffic.

Two structural differences vs the reference, both driven by measured TPU
cost cliffs (dynamic per-element gathers/scatters are ~10-60ms per op at
this scale; masked reductions over the small N axis fuse and cost ~0.1ms):

* children statistics live on the NODES, and a node's children are found
  by matching ``parent == cur`` over the [B, N] axis — there is NO
  [B, N, A] children-index table at all.  The prior of the edge leading to
  a node is recorded at allocation (``edge_prior``), so PUCT for
  materialized children runs entirely on [B, N] arrays; only unvisited
  children need the [B, A] prior row of the current node (one masked
  reduction over N).
* a node is materialized only when first *visited*; the reference
  materializes every legal child at expansion (alpha_expand,
  node.rs:139-174).  Search semantics (PUCT scores, visit counts) are
  unchanged because an unvisited reference child always has visits=0,
  value=0, so capacity ``N = iterations + 1`` suffices.
* env states are NOT stored on the tree at all: ``env.step`` is
  deterministic (counter-based dice stream), so the state at any node is
  reproduced by re-stepping along the descent path — the select loops
  carry the current state and pay one cheap [B]-wide ``env.step`` per
  level instead of a [B, N, state]-wide masked gather AND full-array
  write per allocation (the dominant tree-mechanics HBM traffic).
  Only scalar node metadata (done/winner/player) is recorded.

The only [B, N, A]-sized array is ``prior`` (one row written per
expansion, one row read per selection level).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from die_e_tpu.ops.rows import LANE, gather_rows, pad_actions, scatter_rows

# plain ints, not jnp scalars: module import must not initialize the XLA
# backend (jax.distributed.initialize requires a pristine backend, and the
# multihost worker imports this transitively before joining the cluster)
NO_PARENT = -1
UNVISITED = -1


@struct.dataclass
class Tree:
    """Stacked search tree over B games, N node slots, A actions.

    prior[b, n, a] is the masked+renormalized policy prior of action ``a``
    at node ``n`` (reference turn_policy_to_probs_tensor_parallel semantics,
    src/mcts/utils.rs:60-72) with the sentinel -1.0 marking illegal actions;
    it is only meaningful once ``expanded[b, n]``.  For the pure-rollout
    search (no NN priors) the same slot stores legality (1.0 legal / -1.0
    illegal).
    """

    parent: jnp.ndarray       # [B, N] i32, NO_PARENT for root / free slots
    action: jnp.ndarray       # [B, N] i32 action leading here from parent
    edge_prior: jnp.ndarray   # [B, N] f32 prior of the edge into this node
    prior: jnp.ndarray        # [B, N, A] f32, -1.0 = illegal
    visits: jnp.ndarray       # [B, N] f32
    value_sum: jnp.ndarray    # [B, N] f32
    expanded: jnp.ndarray     # [B, N] bool
    node_done: jnp.ndarray    # [B, N] bool — game over at this node
    node_winner: jnp.ndarray  # [B, N] i32 — winner at this node (0 = none/draw)
    node_player: jnp.ndarray  # [B, N] i32 — player to move at this node
    num_expanded: jnp.ndarray  # [B, N] i32 — children created (rollout search)
    num_legal: jnp.ndarray    # [B, N] i32 — legal actions (set with the prior)
    node_count: jnp.ndarray   # [B] i32 — allocated nodes per game
    action_count: Any = struct.field(pytree_node=False, default=0)  # true A

    @property
    def batch_size(self):
        return self.parent.shape[0]

    @property
    def capacity(self):
        return self.parent.shape[1]

    @property
    def num_actions(self):
        return self.action_count

    @property
    def padded_actions(self):
        return self.prior.shape[2] * self.prior.shape[3]


def node_onehot(tree: Tree, idx):
    """[B, N] one-hot of a per-game node index (the workhorse: every node
    addressing op is a masked reduction/update against this)."""
    n = jnp.arange(tree.capacity)
    return idx[:, None] == n[None, :]


def init_tree(env, states, capacity: int) -> Tree:
    """Preallocate the tree with root nodes (slot 0) for ``states``
    (root metadata only; states themselves are never stored — see module
    doc)."""
    first = jax.tree_util.tree_leaves(states)[0]
    b = first.shape[0]
    n = capacity
    a = env.spec.num_actions

    done = jax.vmap(env.done)(states)
    winner = jax.vmap(env.winner)(states)
    player0 = jax.vmap(env.player)(states)
    return Tree(
        parent=jnp.full((b, n), NO_PARENT, jnp.int32),
        action=jnp.full((b, n), jnp.int32(-1)),
        edge_prior=jnp.zeros((b, n), jnp.float32),
        # bf16: the prior store is the only [B,N,A]-scale array; PUCT
        # ranking tolerates the reduced mantissa (probabilities, compared
        # within ~1e-2).  Stored [B, N, R, 128] with the action axis padded
        # (padding = the -1.0 illegal sentinel) so the pallas row-DMA
        # kernel satisfies Mosaic's (8, 128) slice-tiling rules — see
        # die_e_tpu/ops/rows.py.
        prior=jnp.full((b, n, pad_actions(a) // LANE, LANE), -1.0,
                       jnp.bfloat16),
        visits=jnp.zeros((b, n), jnp.float32),
        value_sum=jnp.zeros((b, n), jnp.float32),
        expanded=jnp.zeros((b, n), bool),
        node_done=jnp.zeros((b, n), bool).at[:, 0].set(done),
        node_winner=jnp.zeros((b, n), jnp.int32).at[:, 0].set(winner),
        node_player=jnp.zeros((b, n), jnp.int32).at[:, 0].set(player0),
        num_expanded=jnp.zeros((b, n), jnp.int32),
        num_legal=jnp.zeros((b, n), jnp.int32),
        node_count=jnp.ones((b,), jnp.int32),
        action_count=a,
    )


def _reduce_at(leaf, oh):
    """Σ_n leaf[b, n, ...] * oh[b, n] without a dynamic gather."""
    ohx = oh.reshape(oh.shape + (1,) * (leaf.ndim - 2))
    return jnp.sum(jnp.where(ohx, leaf, jnp.zeros((), leaf.dtype)), axis=1)


def node_field(tree: Tree, field, idx):
    """field[b, idx[b]] for a [B, N] field, as a masked reduction."""
    oh = node_onehot(tree, idx)
    return _reduce_at(field, oh)


def allocate(tree: Tree, env, parent_idx, action_idx, edge_p, mask,
             child_states) -> tuple:
    """Materialize the child reached from ``parent_idx`` via ``action_idx``
    for games where ``mask``; returns (tree, new_node_idx [B]).

    ``child_states`` is the stepped state of the new node, computed by the
    caller from the state it is already carrying down the descent path
    (states are never stored on the tree — see module doc).  ``edge_p`` is
    the prior of the traversed edge, recorded on the node so PUCT never has
    to look it up again.  Equivalent to the reference's NodeStore::add_node
    at first visit (node_store.rs:24-43).
    """
    new_idx = tree.node_count
    oh_new = node_onehot(tree, new_idx)
    sel = oh_new & mask[:, None]
    done = jax.vmap(env.done)(child_states)
    winner = jax.vmap(env.winner)(child_states)
    child_player = jax.vmap(env.player)(child_states)
    tree = tree.replace(
        parent=jnp.where(sel, parent_idx[:, None], tree.parent),
        action=jnp.where(sel, action_idx[:, None], tree.action),
        edge_prior=jnp.where(sel, edge_p[:, None], tree.edge_prior),
        node_done=jnp.where(sel, done[:, None], tree.node_done),
        node_winner=jnp.where(sel, winner[:, None], tree.node_winner),
        node_player=jnp.where(sel, child_player[:, None], tree.node_player),
        node_count=tree.node_count + mask.astype(jnp.int32),
    )
    return tree, new_idx


def prior_row(tree: Tree, idx):
    """[B, A] prior row of node ``idx``: a pallas row-DMA on TPU (O(B*A)
    HBM traffic, independent of N), masked reduction elsewhere."""
    row = gather_rows(tree.prior, idx)  # [B, R, 128]
    b = row.shape[0]
    return row.reshape(b, -1)[:, : tree.num_actions].astype(jnp.float32)


def set_prior_row(tree: Tree, idx, rows, mask) -> Tree:
    """Install ``rows`` as node ``idx``'s prior and mark it expanded
    (alpha_expand_tensor, src/mcts/node.rs:157-174, without materializing
    the children)."""
    oh = node_onehot(tree, idx)
    sel = oh & mask[:, None]
    nl = jnp.sum(rows >= 0.0, axis=-1).astype(jnp.int32)
    b = rows.shape[0]
    a_pad = tree.padded_actions
    rows_p = jnp.full((b, a_pad), -1.0, tree.prior.dtype)
    rows_p = rows_p.at[:, : rows.shape[1]].set(rows.astype(tree.prior.dtype))
    rows_p = rows_p.reshape(b, tree.prior.shape[2], tree.prior.shape[3])
    return tree.replace(
        prior=scatter_rows(tree.prior, idx, rows_p, mask),
        expanded=jnp.where(sel, True, tree.expanded),
        num_legal=jnp.where(sel, nl[:, None], tree.num_legal),
    )


def children_of(tree: Tree, idx):
    """[B, N] bool — materialized children of node ``idx``."""
    return tree.parent == idx[:, None]


def backprop(tree: Tree, leaf_idx, value, mask=None) -> Tree:
    """Add ``value`` and one visit to every node on the leaf->root chain.

    Mirrors the reference's backpropagate (src/mcts/simple_mcts.rs:96-103):
    the SAME value is added at every level — no sign alternation — which is
    the reference's (non-negamax) semantics, kept for learning-curve parity.
    All work is on [B, N] arrays.
    """
    if mask is None:
        mask = jnp.ones((tree.batch_size,), bool)

    def cond(carry):
        _, _, cur, active = carry
        return jnp.any(active)

    def body(carry):
        visits, value_sum, cur, active = carry
        oh = node_onehot(tree, cur) & active[:, None]
        visits = visits + oh.astype(visits.dtype)
        value_sum = value_sum + jnp.where(oh, value[:, None], 0.0)
        nxt = node_field(tree, tree.parent, cur)
        active = active & (nxt != NO_PARENT)
        return visits, value_sum, jnp.where(active, nxt, cur), active

    visits, value_sum, _, _ = jax.lax.while_loop(
        cond, body, (tree.visits, tree.value_sum, leaf_idx, mask)
    )
    return tree.replace(visits=visits, value_sum=value_sum)


def backprop_path(tree: Tree, path, value) -> Tree:
    """Add ``value`` and one visit to every node flagged in ``path`` [B, N].

    The select loops already walk the root->leaf chain, so they record it as
    a boolean path mask for free; backprop is then ONE vectorized update
    instead of a second O(depth) leaf->root ``while_loop`` (the round-2
    profile attributed ~40% of non-NN search time to that second walk).
    Identical semantics to :func:`backprop` — the reference adds the SAME
    value at every level, no sign alternation (src/mcts/simple_mcts.rs:96-103)
    — because a select descent visits each chain node exactly once.
    """
    pf = path.astype(tree.visits.dtype)
    return tree.replace(
        visits=tree.visits + pf,
        value_sum=tree.value_sum + value[:, None] * pf,
    )


def root_visit_probs(tree: Tree) -> jnp.ndarray:
    """[B, A] root-children visit-count distribution (reference
    get_prob_tensor_parallel, src/mcts/utils.rs:42-58).  All-zero rows mean
    the root had no children (terminal root), matching the reference's None.
    """
    is_root_child = tree.parent == 0  # [B, N]
    w = jnp.where(is_root_child, tree.visits, 0.0)  # [B, N]
    a = jnp.arange(tree.num_actions)
    oh_a = tree.action[:, :, None] == a[None, None, :]  # [B, N, A]
    counts = jnp.sum(jnp.where(oh_a, w[:, :, None], 0.0), axis=1)
    total = jnp.sum(counts, axis=-1, keepdims=True)
    return jnp.where(total > 0, counts / jnp.maximum(total, 1e-9), 0.0)


def root_q_values(tree: Tree) -> jnp.ndarray:
    """[B, A] root-children mean values (reference win_pct, node.rs:114-116
    — used by select_win_pct, simple_mcts.rs:54-69); -inf where no child."""
    is_root_child = tree.parent == 0
    a = jnp.arange(tree.num_actions)
    oh_a = (tree.action[:, :, None] == a[None, None, :]) & is_root_child[:, :, None]
    cv = jnp.sum(jnp.where(oh_a, tree.visits[:, :, None], 0.0), axis=1)
    cs = jnp.sum(jnp.where(oh_a, tree.value_sum[:, :, None], 0.0), axis=1)
    return jnp.where(cv > 0, cs / jnp.maximum(cv, 1e-9), -jnp.inf)
