"""Parity tests: sparse edge-list ops vs dense oracle (SURVEY.md §4 —
per-layer activation allclose against a dense-path oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import networkx as nx
import pytest

from tpugraph.core.graph import (
    graph_from_dense,
    graph_from_networkx,
    graph_to_dense,
)
from tpugraph.core.khop import (
    khop_reachability,
    khop_subgraph,
    extract_dense_subgraph,
)
from tpugraph.ops import spmm, sddmm, dense_spmm, sym_normalize_weights


def random_adj(rng, n=37, p=0.15, weighted=False):
    a = (rng.random((n, n)) < p).astype(np.float64)
    a = np.triu(a, 1)
    a = a + a.T
    if weighted:
        w = rng.random((n, n))
        w = np.triu(w, 1)
        w = w + w.T
        a = a * w
    return a


def test_dense_roundtrip(rng):
    adj = random_adj(rng, weighted=True)
    g = graph_from_dense(adj)
    back = np.asarray(graph_to_dense(g, adj.shape[0]))
    np.testing.assert_allclose(back, adj, rtol=1e-6)


def test_spmm_matches_dense(rng):
    adj = random_adj(rng, weighted=True)
    n = adj.shape[0]
    x = rng.standard_normal((n, 8)).astype(np.float32)
    g = graph_from_dense(adj)
    x_pad = np.zeros((g.num_nodes_padded, 8), dtype=np.float32)
    x_pad[:n] = x
    y_sparse = spmm(g.senders, g.receivers, g.edge_weight, jnp.asarray(x_pad))
    y_dense = dense_spmm(jnp.asarray(adj.astype(np.float32)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_sparse)[:n], np.asarray(y_dense), atol=1e-4)


def test_sym_normalize_matches_host(rng):
    adj = random_adj(rng)
    g_norm = graph_from_dense(adj, normalize=True)
    g_raw = graph_from_dense(adj)
    n = adj.shape[0]
    w_dev = sym_normalize_weights(
        g_raw.senders, g_raw.receivers, g_raw.edge_weight, g_raw.num_nodes_padded
    )
    np.testing.assert_allclose(
        np.asarray(w_dev), np.asarray(g_norm.edge_weight), atol=1e-5
    )
    # also against the reference formula D^-1/2 A D^-1/2
    deg = adj.sum(0)
    inv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
    ref = np.diag(inv) @ adj @ np.diag(inv)
    back = np.asarray(graph_to_dense(g_norm, n))
    np.testing.assert_allclose(back, ref, atol=1e-5)


def test_sddmm_matches_dense(rng):
    adj = random_adj(rng)
    n = adj.shape[0]
    g = graph_from_dense(adj)
    a = rng.standard_normal((g.num_nodes_padded, 5)).astype(np.float32)
    scores = sddmm(g.senders, g.receivers, jnp.asarray(a), jnp.asarray(a))
    dense_scores = a[:n] @ a[:n].T
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    live = np.asarray(g.edge_weight) != 0
    np.testing.assert_allclose(
        np.asarray(scores)[live], dense_scores[r[live], s[live]].T.diagonal()
        if False
        else dense_scores[s[live], r[live]],
        atol=1e-4,
    )


def test_khop_matches_reference_powersum(rng):
    adj = random_adj(rng, n=30, p=0.12)
    n = adj.shape[0]
    g = graph_from_dense(adj)
    # reference: hop_adj = (A + A^2 + A^3) > 0  (graph_utils.py:147-158)
    a = adj.copy()
    hop = adj.copy()
    for _ in range(2):
        a = a @ adj
        hop = hop + a
    hop = (hop > 0).astype(int)
    for node in range(0, n, 7):
        reach = np.asarray(khop_reachability(g, jnp.asarray(node), 3))[:n]
        expected = set(np.nonzero(hop[node])[0]) | {node}
        got = set(np.nonzero(reach)[0])
        assert got == expected or got == expected | {node}


def test_khop_subgraph_new_index(rng):
    adj = random_adj(rng, n=40, p=0.1)
    g = graph_from_dense(adj)
    feat = rng.standard_normal((40, 3))
    labels = rng.integers(0, 4, 40)
    for node in [3, 17, 39]:
        nb = khop_subgraph(g, jnp.asarray(node), 3)
        new_idx, sub_adj, sub_feat, sub_label, neighbors = extract_dense_subgraph(
            adj, feat, labels, node, 3
        )
        # node sets agree (up to self-inclusion, which we force)
        got = set(np.nonzero(np.asarray(nb.node_mask))[0])
        assert set(neighbors) == got
        assert int(nb.new_index) == new_idx
        assert int(nb.num_nodes) == len(neighbors)
        # edges kept iff both endpoints reachable
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        live = np.asarray(g.edge_weight) != 0
        keep = np.asarray(nb.edge_mask) > 0
        for e in np.nonzero(live)[0]:
            expected = s[e] in got and r[e] in got
            assert bool(keep[e]) == expected


def test_graph_from_networkx_matches_dense():
    G = nx.barbell_graph(5, 2)
    adj = np.asarray(nx.to_numpy_array(G))
    g = graph_from_networkx(G)
    np.testing.assert_allclose(
        np.asarray(graph_to_dense(g, G.number_of_nodes())), adj
    )


def test_edge_pair_symmetric():
    G = nx.cycle_graph(6)
    g = graph_from_networkx(G)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    p = np.asarray(g.edge_pair)
    live = np.asarray(g.edge_weight) != 0
    pairs = {}
    for e in np.nonzero(live)[0]:
        key = (min(s[e], r[e]), max(s[e], r[e]))
        pairs.setdefault(key, set()).add(p[e])
    for key, ids in pairs.items():
        assert len(ids) == 1  # both directions share one undirected id
    assert len({list(v)[0] for v in pairs.values()}) == len(pairs)
