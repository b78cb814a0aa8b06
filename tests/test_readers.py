"""Reader tests with synthetic on-disk fixtures (BioSnap PPI, Enron
pickles) and the vmapped sparse batch path."""

import os
import pickle

import numpy as np
import networkx as nx
import pytest

from tpugraph.data.readers import ENRON_LABELS, load_enron_slices, read_biosnap


def test_read_biosnap(tmp_path, rng):
    d = tmp_path
    # edge list tsv: a 12-node graph, two components (largest kept)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 4),
             (10, 11)]  # small separate component -> dropped
    with open(d / "ppi.tsv", "w") as f:
        f.write("# gene_a\tgene_b\n")
        for a, b in edges:
            f.write(f"{a}\t{b}\n")
    # two-column essentiality labels (reference io_utils.py:584-592);
    # gene 5 unlabeled -> dropped
    with open(d / "ess.tsv", "w") as f:
        f.write("1\tEssential\n2\tNon-Essential\n3\tEssential\n"
                "4\tNon-Essential\n")
    # gene-motif features for labeled genes (gene 2 missing -> dropped)
    with open(d / "feat.csv", "w") as f:
        f.write("gene,m1,m2,m3\n")
        for g in [1, 3, 4, 5]:
            f.write(f"{g},{rng.random():.3f},{rng.random():.3f},1.0\n")

    G = read_biosnap(str(d), "ppi.tsv", "ess.tsv", feat_file="feat.csv")
    # gene 5 (unlabeled), gene 2 (no features), small component all gone
    assert G.number_of_nodes() == 3
    labels = sorted(G.nodes[u]["label"] for u in G.nodes())
    assert labels == [0, 1, 1]
    feat = G.nodes[list(G.nodes())[0]]["feat"]
    # log-features + [1.0] marker + degree one-hot(10)
    assert feat.shape[0] == 3 + 1 + 10
    assert feat[3] == 1.0
    # nodes relabeled from 0
    assert min(G.nodes()) == 0


def test_read_biosnap_no_feat_file(tmp_path):
    with open(tmp_path / "ppi.tsv", "w") as f:
        f.write("1\t2\n2\t3\n")
    with open(tmp_path / "ess.tsv", "w") as f:
        f.write("1\tNon-Essential\n2\tEssential\n3\tNon-Essential\n")
    G = read_biosnap(str(tmp_path), "ppi.tsv", "ess.tsv")
    assert G.number_of_nodes() == 3
    assert G.nodes[0]["feat"].shape == (10,)
    assert sorted(G.nodes[u]["label"] for u in G.nodes()) == [0, 0, 1]


def test_load_enron_slices(tmp_path):
    d = tmp_path / "gnn-explainer-enron"
    os.makedirs(d)
    for i in range(10):
        G = nx.gnp_random_graph(12, 0.3, seed=i)
        for u in list(G.nodes())[:4]:
            G.nodes[u]["role"] = "Employee"
        with open(d / f"enron_slice_{i}.pkl", "wb") as f:
            pickle.dump(G, f)
    slices = load_enron_slices(str(tmp_path), input_dim=6)
    assert len(slices) == 10
    first = slices[0]
    u0 = list(first.nodes())[0]
    assert first.nodes[u0]["feat"].shape == (6,)
    labels = [ENRON_LABELS[first.nodes[u].get("role", "None")]
              for u in first.nodes()]
    assert set(labels) <= set(range(6))


def test_vmapped_sparse_batch_matches_dense(rng):
    """Batched sparse encoder via vmap over BatchedGraphs == dense batch."""
    import jax
    import jax.numpy as jnp

    from tpugraph.core.graph import batch_graphs, graph_from_dense
    from tpugraph.nn import GcnEncoderGraph
    from tpugraph.nn.layers import SparseAdj

    b, n, dfeat = 3, 16, 5
    adjs, graphs = [], []
    for i in range(b):
        a = (rng.random((n, n)) < 0.25).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        adjs.append(a)
        graphs.append(graph_from_dense(a, num_nodes_padded=n,
                                       num_edges_padded=256))
    bg = batch_graphs(graphs)
    x = rng.standard_normal((b, n, dfeat)).astype(np.float32)
    model = GcnEncoderGraph(input_dim=dfeat, hidden_dim=8, embedding_dim=8,
                            label_dim=2, num_layers=3)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(np.stack(adjs)))
    pred_dense, _ = model.apply(params, jnp.asarray(x),
                                jnp.asarray(np.stack(adjs)))

    def one(xg, s, r, w):
        pred, _ = model.apply(params, xg, SparseAdj(s, r, w))
        return pred

    pred_sparse = jax.vmap(one)(jnp.asarray(x), bg.senders, bg.receivers,
                                bg.edge_weight)
    np.testing.assert_allclose(np.asarray(pred_sparse),
                               np.asarray(pred_dense), atol=1e-4)
