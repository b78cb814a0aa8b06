"""Static-shape sparse graph containers.

The reference framework (RexYing/gnn-model-explainer) represents every graph
as a dense ``[B, N, N]`` adjacency matrix (reference ``gengraph.py:74-98``,
``utils/graph_utils.py:39-45``).  On TPU the native representation is a
*padded COO edge list*: XLA requires static shapes, so nodes **and** edges are
padded to fixed budgets and masked.  Message passing becomes gather +
``segment_sum`` (or a Pallas block-sparse kernel), which is O(E) instead of
O(N^2) and shards across a device mesh by edge partitioning.

All containers here are JAX pytrees (NamedTuples of arrays) so they pass
freely through ``jit`` / ``vmap`` / ``shard_map``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp


class Graph(NamedTuple):
    """A single padded sparse graph.

    Attributes:
      senders:    int32[E_pad] source node of each directed edge.  An
                  undirected graph stores both (i, j) and (j, i).
      receivers:  int32[E_pad] destination node of each directed edge.
      edge_weight: float32[E_pad] weight per edge; exactly 0.0 for padding
                  slots (padding edges also point at node 0 so gathers stay
                  in-bounds but contribute nothing).
      node_mask:  float32[N_pad] 1.0 for real nodes, 0.0 for padding.
      n_node:     int32 scalar — number of real nodes.
      n_edge:     int32 scalar — number of real (directed) edges.
      edge_pair:  int32[E_pad] index of the *undirected* edge this directed
                  edge belongs to (both directions of one undirected edge
                  share an id).  Used by the explainer so one mask parameter
                  gates both directions (the TPU-native, O(E) analog of the
                  reference's symmetrized N x N mask, ``explain.py:665-678``).
    """

    senders: jax.Array
    receivers: jax.Array
    edge_weight: jax.Array
    node_mask: jax.Array
    n_node: jax.Array
    n_edge: jax.Array
    edge_pair: jax.Array

    @property
    def num_nodes_padded(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[-1]


class BatchedGraphs(NamedTuple):
    """A batch of padded graphs for graph classification.

    Unlike the reference's ``GraphSampler`` (``utils/graph_utils.py:11-145``)
    which pads dense ``N x N`` adjacencies, we stack padded edge lists.  Every
    leading axis is the batch axis, so this batches under ``vmap`` and shards
    over a ``data`` mesh axis with ``NamedSharding(P("data"))``.
    """

    senders: jax.Array      # int32[B, E_pad]
    receivers: jax.Array    # int32[B, E_pad]
    edge_weight: jax.Array  # float32[B, E_pad]
    node_mask: jax.Array    # float32[B, N_pad]
    n_node: jax.Array       # int32[B]
    n_edge: jax.Array       # int32[B]
    edge_pair: jax.Array    # int32[B, E_pad]

    def graph(self, i: int) -> Graph:
        return Graph(*(x[i] for x in self))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def graph_from_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    num_nodes_padded: Optional[int] = None,
    num_edges_padded: Optional[int] = None,
    normalize: bool = False,
    pad_multiple: int = 8,
) -> Graph:
    """Build a padded :class:`Graph` from host-side directed edge arrays.

    Args:
      normalize: symmetric normalization ``D^-1/2 A D^-1/2`` — the sparse
        analog of reference ``utils/graph_utils.py:40-44``.
    """
    senders = np.asarray(senders, dtype=np.int32)
    receivers = np.asarray(receivers, dtype=np.int32)
    e = senders.shape[0]
    if edge_weight is None:
        edge_weight = np.ones((e,), dtype=np.float32)
    else:
        edge_weight = np.asarray(edge_weight, dtype=np.float32)

    if normalize and e > 0:
        # Weighted degree per node (over incoming edges; symmetric graphs
        # have equal in/out degree).  Reference normalizes columns then rows
        # with 1/sqrt(deg) — identical for symmetric A.
        deg = np.zeros((num_nodes,), dtype=np.float64)
        np.add.at(deg, receivers, edge_weight)
        inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
        edge_weight = (edge_weight * inv_sqrt[senders] * inv_sqrt[receivers]).astype(
            np.float32
        )

    n_pad = num_nodes_padded or _round_up(max(num_nodes, 1), pad_multiple)
    e_pad = num_edges_padded or _round_up(max(e, 1), pad_multiple)
    if n_pad < num_nodes or e_pad < e:
        raise ValueError(
            f"padding budget too small: nodes {num_nodes}>{n_pad} or edges {e}>{e_pad}"
        )

    s = np.zeros((e_pad,), dtype=np.int32)
    r = np.zeros((e_pad,), dtype=np.int32)
    w = np.zeros((e_pad,), dtype=np.float32)
    s[:e], r[:e], w[:e] = senders, receivers, edge_weight

    # Undirected-pair ids: canonical (min, max) ordering; padding slots get
    # a sentinel id of e_pad (one past the last real pair id).  Vectorized:
    # both directions of an undirected edge share one canonical key.
    pair = np.full((e_pad,), e_pad, dtype=np.int32)
    if e > 0:
        lo = np.minimum(s[:e], r[:e]).astype(np.int64)
        hi = np.maximum(s[:e], r[:e]).astype(np.int64)
        keys = lo * np.int64(n_pad) + hi
        _, inverse = np.unique(keys, return_inverse=True)
        pair[:e] = inverse.astype(np.int32)

    node_mask = np.zeros((n_pad,), dtype=np.float32)
    node_mask[:num_nodes] = 1.0

    return Graph(
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        edge_weight=jnp.asarray(w),
        node_mask=jnp.asarray(node_mask),
        n_node=jnp.asarray(num_nodes, dtype=jnp.int32),
        n_edge=jnp.asarray(e, dtype=jnp.int32),
        edge_pair=jnp.asarray(pair),
    )


def graph_from_dense(
    adj: np.ndarray,
    normalize: bool = False,
    num_nodes_padded: Optional[int] = None,
    num_edges_padded: Optional[int] = None,
) -> Graph:
    """Convert a dense adjacency matrix (the reference's native format) to a
    padded sparse :class:`Graph`.  Nonzero entries become directed edges with
    their value as the edge weight."""
    adj = np.asarray(adj)
    if adj.ndim == 3:  # reference keeps a leading batch dim of 1
        adj = adj[0]
    num_nodes = adj.shape[0]
    senders, receivers = np.nonzero(adj)
    weights = adj[senders, receivers].astype(np.float32)
    return graph_from_edges(
        senders.astype(np.int32),
        receivers.astype(np.int32),
        num_nodes,
        edge_weight=weights,
        num_nodes_padded=num_nodes_padded,
        num_edges_padded=num_edges_padded,
        normalize=normalize,
    )


def graph_from_networkx(
    G,
    normalize: bool = False,
    num_nodes_padded: Optional[int] = None,
    num_edges_padded: Optional[int] = None,
) -> Graph:
    """Build a padded sparse Graph from an (undirected) networkx graph.

    Node order follows ``G.nodes()`` iteration order, matching the feature
    extraction convention of reference ``gengraph.py:88-92``.
    """
    nodes = list(G.nodes())
    index = {u: i for i, u in enumerate(nodes)}
    senders, receivers = [], []
    for u, v in G.edges():
        ui, vi = index[u], index[v]
        senders.append(ui)
        receivers.append(vi)
        if ui != vi:
            senders.append(vi)
            receivers.append(ui)
    return graph_from_edges(
        np.asarray(senders, dtype=np.int32),
        np.asarray(receivers, dtype=np.int32),
        len(nodes),
        num_nodes_padded=num_nodes_padded,
        num_edges_padded=num_edges_padded,
        normalize=normalize,
    )


def graph_to_dense(g: Graph, num_nodes: Optional[int] = None) -> jnp.ndarray:
    """Densify a sparse graph back to an ``[N, N]`` adjacency (oracle path and
    ``.npy`` mask export, matching the reference's dense contract)."""
    n = num_nodes or g.num_nodes_padded
    dense = jnp.zeros((n, n), dtype=g.edge_weight.dtype)
    return dense.at[g.receivers, g.senders].add(g.edge_weight)


def pad_graph(g: Graph, num_nodes_padded: int, num_edges_padded: int) -> Graph:
    """Re-pad an existing graph to larger static budgets (host-side)."""
    s = np.zeros((num_edges_padded,), dtype=np.int32)
    r = np.zeros((num_edges_padded,), dtype=np.int32)
    w = np.zeros((num_edges_padded,), dtype=np.float32)
    p = np.full((num_edges_padded,), num_edges_padded, dtype=np.int32)
    e_old = g.num_edges_padded
    if e_old > num_edges_padded:
        raise ValueError("cannot shrink edge padding")
    s[:e_old] = np.asarray(g.senders)
    r[:e_old] = np.asarray(g.receivers)
    w[:e_old] = np.asarray(g.edge_weight)
    old_pair = np.asarray(g.edge_pair)
    p[:e_old] = np.where(old_pair == e_old, num_edges_padded, old_pair)
    mask = np.zeros((num_nodes_padded,), dtype=np.float32)
    mask[: int(g.n_node)] = 1.0
    return Graph(
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        edge_weight=jnp.asarray(w),
        node_mask=jnp.asarray(mask),
        n_node=g.n_node,
        n_edge=g.n_edge,
        edge_pair=jnp.asarray(p),
    )


def batch_graphs(graphs: list[Graph]) -> BatchedGraphs:
    """Stack same-budget padded graphs into a batch (leading batch axis)."""
    return BatchedGraphs(
        senders=jnp.stack([g.senders for g in graphs]),
        receivers=jnp.stack([g.receivers for g in graphs]),
        edge_weight=jnp.stack([g.edge_weight for g in graphs]),
        node_mask=jnp.stack([g.node_mask for g in graphs]),
        n_node=jnp.stack([g.n_node for g in graphs]),
        n_edge=jnp.stack([g.n_edge for g in graphs]),
        edge_pair=jnp.stack([g.edge_pair for g in graphs]),
    )
