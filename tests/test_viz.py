"""Visualization smoke tests (host-side matplotlib exports)."""

import numpy as np
import networkx as nx

from tpugraph.viz.graphs import (
    denoise_graph,
    log_assignment,
    log_graph,
    plot_cmap,
    save_matrix_image,
)


def test_denoise_threshold_and_topk(rng):
    n = 12
    adj = rng.random((n, n)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.T
    G = denoise_graph(adj, 0, threshold=0.8, max_component=False)
    for (u, v, w) in G.edges(data="weight"):
        assert w >= 0.8
    Gk = denoise_graph(adj, 0, threshold_num=5, max_component=False)
    assert Gk.number_of_edges() <= 6  # ~top-5 undirected (ties allowed)


def test_render_exports(tmp_path, rng):
    G = nx.karate_club_graph()
    for u in G.nodes():
        G.nodes[u]["label"] = u % 3
    for (u, v) in G.edges():
        G.edges[u, v]["weight"] = float(rng.random())
    p1 = log_graph(G, "test/graph", outdir=str(tmp_path))
    assert p1.endswith(".pdf")
    p2 = save_matrix_image(rng.random((6, 6)), "test/mat", outdir=str(tmp_path))
    assert p2.endswith(".png")
    assign = rng.random((G.number_of_nodes(), 5)).astype(np.float32)
    p3 = log_assignment(assign, G, outdir=str(tmp_path))
    assert p3.endswith(".png")
    p4 = plot_cmap(outdir=str(tmp_path))
    assert p4.endswith(".png")


def test_plot_pr_curve(tmp_path, rng):
    from tpugraph.viz.graphs import plot_pr_curve

    real = (rng.random(200) < 0.3).astype(int)
    pred = np.clip(real * 0.7 + rng.random(200) * 0.5, 0, 1)
    p = plot_pr_curve(real, pred, "pr_test", outdir=str(tmp_path))
    assert p.endswith(".png")
    import os
    assert os.path.getsize(p) > 1000
