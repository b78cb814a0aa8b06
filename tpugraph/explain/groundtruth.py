"""Motif ground truth and explanation-accuracy AUC.

The closest thing to a correctness test the reference has (SURVEY §4):
``make_pred_real`` labels the edges of the known motif (house for
syn1/syn2, 6-cycle for syn4) as ground truth 1 and everything else 0, and
the mask weights are scored with ROC-AUC against it (reference
``explain.py:535-579``, ``explain.py:325-351``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


_HOUSE_EDGES = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 4), (1, 4)]
_CYCLE6_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]


def _grid_edges(dim: int = 3):
    """Edges of a dim x dim grid under the generator's node numbering
    (``nx.grid_graph`` relabeled row-major — data/shapes.py:grid)."""
    edges = []
    for i in range(dim):
        for j in range(dim):
            a = i * dim + j
            if j + 1 < dim:
                edges.append((a, a + 1))
            if i + 1 < dim:
                edges.append((a, a + dim))
    return edges


MOTIF_EDGES = {
    "syn1": _HOUSE_EDGES,
    "syn2": _HOUSE_EDGES,
    # grid motifs: an EXTENSION over the reference, whose make_pred_real
    # only covers syn1/syn2/syn4 (explain.py:535-579)
    "syn3": _grid_edges(3),
    "syn4": _CYCLE6_EDGES,
    "syn5": _grid_edges(3),
}


def make_pred_real(
    adj: np.ndarray, start: int, dataset: str = "syn1"
) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle mask weights + ground-truth motif-edge labels.

    ``adj`` is the (dense) masked sub-adjacency in ascending neighbor
    order, ``start`` the query node's index in it — motif nodes occupy
    ``start..start+k`` because the generators allocate motif node ids
    consecutively and extraction preserves order (reference
    ``explain.py:535-579``).
    """
    if dataset not in MOTIF_EDGES:
        raise ValueError(f"no motif ground truth for dataset {dataset!r}")
    adj = np.asarray(adj)
    sel = np.triu(adj) > 0
    pred = adj[sel]
    real = adj.copy()
    n = adj.shape[0]
    for (i, j) in MOTIF_EDGES[dataset]:
        a, b = start + i, start + j
        if a < n and b < n and real[a][b] > 0:
            real[a][b] = 10.0
    real = real[sel]
    real = (real == 10.0).astype(np.float64)
    return pred, real


def explanation_auc(
    masked_adjs: List[np.ndarray],
    starts: List[int],
    dataset: str,
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Aggregate ROC-AUC over many explained nodes (reference
    ``explain_nodes_gnn_stats``, ``explain.py:325-337``)."""
    from sklearn.metrics import roc_auc_score

    preds, reals = [], []
    for adj, start in zip(masked_adjs, starts):
        p, r = make_pred_real(adj, start, dataset)
        preds.append(p)
        reals.append(r)
    pred_all = np.concatenate(preds, axis=0)
    real_all = np.concatenate(reals, axis=0)
    return float(roc_auc_score(real_all, pred_all)), real_all, pred_all
