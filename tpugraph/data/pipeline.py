"""Static-shape batching pipeline.

Replaces the reference's ``GraphSampler`` + torch ``DataLoader``
(``utils/graph_utils.py:11-145``, ``train.py:46-124``) with a pure-Python
iterator producing padded, static-shape batches ready for
``jax.device_put``.  Nodes *and* edges are padded to fixed budgets so every
training step hits the same compiled executable (XLA requirement); feature
construction modes (``default``/``id``/``deg-num``/``deg``/``struct``)
match the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import networkx as nx
import numpy as np


@dataclasses.dataclass
class DenseGraphBatch:
    """Dense padded batch for graph classification (MXU path).

    Mirrors the per-item dict of reference ``graph_utils.py:132-145``
    (`adj`, `feats`, `label`, `num_nodes`, `assign_feats`) stacked along a
    batch axis."""

    adj: np.ndarray          # [B, N, N] float32
    feats: np.ndarray        # [B, N, D] float32
    label: np.ndarray        # [B] int32
    num_nodes: np.ndarray    # [B] int32
    node_mask: np.ndarray    # [B, N] float32
    assign_feats: np.ndarray # [B, N, Da] float32


def _graph_feats(
    G: nx.Graph,
    adj: np.ndarray,
    max_num_nodes: int,
    feat_dim: int,
    features: str,
) -> np.ndarray:
    """Per-graph feature matrix, zero-padded to ``max_num_nodes`` rows.
    Feature modes follow reference ``graph_utils.py:49-117``."""
    n = G.number_of_nodes()
    if features == "default":
        f = np.zeros((max_num_nodes, feat_dim), dtype=np.float32)
        for i, u in enumerate(G.nodes()):
            f[i, :] = G.nodes[u]["feat"]
        return f
    if features == "id":
        return np.identity(max_num_nodes, dtype=np.float32)
    if features == "deg-num":
        degs = np.sum(adj, 1)
        out = np.zeros((max_num_nodes, 1), dtype=np.float32)
        out[:n, 0] = degs[:n]
        return out
    if features == "deg":
        max_deg = 10
        degs = np.minimum(np.sum(adj, 1).astype(int), max_deg)
        onehot = np.zeros((n, max_deg + 1), dtype=np.float32)
        onehot[np.arange(n), degs[:n]] = 1
        onehot = np.pad(onehot, ((0, max_num_nodes - n), (0, 0)))
        f = np.zeros((max_num_nodes, feat_dim), dtype=np.float32)
        for i, u in enumerate(G.nodes()):
            f[i, :] = G.nodes[u]["feat"]
        return np.concatenate([onehot, f], axis=1)
    if features == "struct":
        max_deg = 10
        degs = np.minimum(np.sum(adj, 1).astype(int), max_deg)
        onehot = np.zeros((n, max_deg + 1), dtype=np.float32)
        onehot[np.arange(n), degs[:n]] = 1
        onehot = np.pad(onehot, ((0, max_num_nodes - n), (0, 0)))
        clustering = np.asarray(list(nx.clustering(G).values()), dtype=np.float32)
        clustering = np.pad(clustering, (0, max_num_nodes - n))[:, None]
        g_feat = np.hstack([onehot, clustering])
        first = list(G.nodes())[0]
        if "feat" in G.nodes[first]:
            node_feats = np.array(
                [G.nodes[u]["feat"] for u in G.nodes()], dtype=np.float32
            )
            node_feats = np.pad(node_feats, ((0, max_num_nodes - n), (0, 0)))
            g_feat = np.hstack([g_feat, node_feats])
        return g_feat.astype(np.float32)
    raise ValueError(f"unknown feature mode {features!r}")


class GraphBatcher:
    """Precomputes padded dense tensors for a list of labeled graphs and
    yields shuffled minibatches.

    Equivalent role to reference ``GraphSampler`` (``graph_utils.py:11-145``);
    ``normalize`` applies symmetric degree normalization to each adjacency.
    """

    def __init__(
        self,
        G_list: Sequence[nx.Graph],
        features: str = "default",
        normalize: bool = True,
        assign_feat: str = "default",
        max_num_nodes: int = 0,
    ):
        if max_num_nodes == 0:
            max_num_nodes = max(G.number_of_nodes() for G in G_list)
        self.max_num_nodes = max_num_nodes
        first = G_list[0]
        existing = list(first.nodes())[-1]
        feat_dim = first.nodes[existing]["feat"].shape[0] if "feat" in first.nodes[existing] else 0

        adjs, feats, labels, lens, assigns = [], [], [], [], []
        for G in G_list:
            adj = np.asarray(nx.to_numpy_array(G), dtype=np.float64)
            if normalize:
                deg = np.sum(adj, axis=0)
                inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
                adj = np.diag(inv) @ adj @ np.diag(inv)
            n = G.number_of_nodes()
            padded = np.zeros((max_num_nodes, max_num_nodes), dtype=np.float32)
            padded[:n, :n] = adj
            adjs.append(padded)
            lens.append(n)
            labels.append(G.graph["label"])
            f = _graph_feats(G, adj, max_num_nodes, feat_dim, features)
            feats.append(f)
            if assign_feat == "id":
                assigns.append(
                    np.hstack([np.identity(max_num_nodes, dtype=np.float32), f])
                )
            else:
                assigns.append(f)

        self.adj = np.stack(adjs)
        self.feats = np.stack(feats)
        self.labels = np.asarray(labels, dtype=np.int32)
        self.num_nodes = np.asarray(lens, dtype=np.int32)
        self.assign_feats = np.stack(assigns)
        self.feat_dim = self.feats.shape[-1]
        self.assign_feat_dim = self.assign_feats.shape[-1]

    def __len__(self) -> int:
        return self.adj.shape[0]

    def _mask(self, idx: np.ndarray) -> np.ndarray:
        mask = np.zeros((len(idx), self.max_num_nodes), dtype=np.float32)
        for row, i in enumerate(idx):
            mask[row, : self.num_nodes[i]] = 1.0
        return mask

    def batch(self, idx: np.ndarray) -> DenseGraphBatch:
        idx = np.asarray(idx)
        return DenseGraphBatch(
            adj=self.adj[idx],
            feats=self.feats[idx],
            label=self.labels[idx],
            num_nodes=self.num_nodes[idx],
            node_mask=self._mask(idx),
            assign_feats=self.assign_feats[idx],
        )

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
        pad_final: bool = True,
    ) -> Iterator[DenseGraphBatch]:
        """Yield fixed-size batches; the final short batch is either dropped
        or padded by repeating its first element with a zeroed node_mask
        contribution excluded via ``valid`` count (kept simple: we pad by
        wrapping and callers weight by mask)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    break
                if pad_final:
                    idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            yield self.batch(idx)


def prepare_data(
    graphs: List[nx.Graph],
    train_ratio: float = 0.8,
    test_ratio: float = 0.1,
    features: str = "default",
    max_nodes: int = 0,
    rng: Optional[np.random.Generator] = None,
):
    """Shuffle + split into train/val/test batchers (reference
    ``train.py:46-124``, with the test_graphs code path's known crash
    removed)."""
    rng = rng or np.random.default_rng()
    graphs = list(graphs)
    rng.shuffle(graphs)
    train_idx = int(len(graphs) * train_ratio)
    test_idx = int(len(graphs) * (1 - test_ratio))
    train_graphs = graphs[:train_idx]
    val_graphs = graphs[train_idx:test_idx]
    test_graphs = graphs[test_idx:]
    if max_nodes == 0:
        max_nodes = max(G.number_of_nodes() for G in graphs)
    mk = lambda gs: GraphBatcher(
        gs, features=features, normalize=False, max_num_nodes=max_nodes
    ) if gs else None
    return mk(train_graphs), mk(val_graphs), mk(test_graphs)
