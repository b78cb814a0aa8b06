"""k-hop neighborhood extraction.

The reference computes dense k-hop reachability by repeated adjacency
matmuls, ``hop_adj = (A + A^2 + ... + A^k) > 0`` (reference
``utils/graph_utils.py:147-158``), then slices the dense sub-adjacency
(``explainer/explain.py:492-501``).  On TPU we propagate a frontier mask
along the edge list with ``segment_max`` — O(k * E) instead of O(k * N^2
* N) — and, instead of compacting to a ragged subgraph (dynamic shapes),
we return *masks* over the padded node/edge sets.  The explainer runs the
frozen model on the full padded graph with out-of-neighborhood edges
zeroed; for an L-layer GCN this yields bit-identical predictions at the
query node (any length-<=L path into the query only touches nodes within
L hops).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpugraph.core.graph import Graph


def khop_reachability(g: Graph, node_idx: jax.Array, n_hops: int) -> jax.Array:
    """float32[N_pad] mask of nodes within ``n_hops`` edges of ``node_idx``.

    Includes the query node itself.  (The reference's power-sum reachability
    includes the query through cycle terms of ``A^2`` for every non-isolated
    node — same set in practice.)
    """
    n = g.num_nodes_padded
    reach = jnp.zeros((n,), dtype=jnp.float32).at[node_idx].set(1.0)
    edge_live = (g.edge_weight != 0).astype(jnp.float32)

    def step(reach, _):
        contrib = reach[g.senders] * edge_live
        nxt = jax.ops.segment_max(contrib, g.receivers, num_segments=n)
        reach = jnp.maximum(reach, nxt)
        return reach, None

    reach, _ = jax.lax.scan(step, reach, None, length=n_hops)
    return reach * g.node_mask


class Neighborhood(NamedTuple):
    """Masks describing a k-hop computation subgraph of a padded graph."""

    node_mask: jax.Array   # float32[N_pad] — nodes in the neighborhood
    edge_mask: jax.Array   # bool[E_pad] — edges with both endpoints inside
                           #   (bool: a [Q, E_pad] batch of these rides the
                           #   explainer vmap — 4 bytes/edge would be ~0.5 GB
                           #   at 60 queries x 2M padded edges)
    num_nodes: jax.Array   # int32 — neighborhood size
    new_index: jax.Array   # int32 — rank of the query node among kept nodes
                           #   (reference explain.py:496 `node_idx_new`)


def khop_subgraph(g: Graph, node_idx: jax.Array, n_hops: int) -> Neighborhood:
    """Compute the k-hop neighborhood masks for one query node (device-side,
    ``vmap``-able over query nodes)."""
    reach = khop_reachability(g, node_idx, n_hops)
    edge_keep = (
        (reach[g.senders] > 0)
        & (reach[g.receivers] > 0)
        & (g.edge_weight != 0)
    )
    # Rank of the query node among kept nodes in ascending node order —
    # matches reference explain.py:496 (sum of the reachability row before
    # node_idx), since relabeling preserves ascending order.
    idx = jnp.arange(g.num_nodes_padded)
    new_index = jnp.sum(jnp.where(idx < node_idx, reach, 0.0)).astype(jnp.int32)
    return Neighborhood(
        node_mask=reach,
        edge_mask=edge_keep,
        num_nodes=jnp.sum(reach).astype(jnp.int32),
        new_index=new_index,
    )


def extract_dense_subgraph(
    adj: np.ndarray,
    feat: np.ndarray,
    labels: np.ndarray,
    node_idx: int,
    n_hops: int,
) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side dense neighborhood extraction for export / evaluation.

    Mirrors the contract of reference ``explain.py:492-501``:
    returns ``(node_idx_new, sub_adj, sub_feat, sub_label, neighbors)`` where
    ``neighbors`` are the original indices (ascending) of the kept nodes.
    Uses BFS on the nonzero structure rather than dense matrix powers.
    """
    adj = np.asarray(adj)
    n = adj.shape[0]
    nbrs = [np.nonzero(adj[i])[0] for i in range(n)]
    reach = {int(node_idx)}
    frontier = {int(node_idx)}
    for _ in range(n_hops):
        nxt = set()
        for u in frontier:
            nxt.update(int(v) for v in nbrs[u])
        frontier = nxt - reach
        reach |= nxt
    neighbors = np.asarray(sorted(reach), dtype=np.int64)
    node_idx_new = int(np.searchsorted(neighbors, node_idx))
    sub_adj = adj[np.ix_(neighbors, neighbors)]
    sub_feat = np.asarray(feat)[neighbors]
    sub_label = np.asarray(labels)[neighbors]
    return node_idx_new, sub_adj, sub_feat, sub_label, neighbors
