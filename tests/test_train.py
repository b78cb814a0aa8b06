"""End-to-end training tests: syn1 node classification reaches
reference-level accuracy; checkpoints round-trip; graph classification
trains on a toy TU-style dataset."""

import numpy as np
import jax
import networkx as nx
import pytest

from tpugraph.cli.config import Config
from tpugraph.cli.tasks import run_node_task, padded_features
from tpugraph.core.graph import graph_from_networkx
from tpugraph.data import gengraph, featgen
from tpugraph.data.pipeline import GraphBatcher
from tpugraph.nn import GcnEncoderNode, GcnEncoderGraph
from tpugraph.train.checkpoint import (
    gen_prefix,
    load_checkpoint,
    save_checkpoint,
)
from tpugraph.train.loop import TrainConfig, train_graph_classifier, train_node_classifier


@pytest.fixture(scope="module")
def syn1_small():
    G, labels, _ = gengraph.gen_syn1(
        nb_shapes=30,
        width_basis=120,
        feature_generator=featgen.ConstFeatureGen(np.ones(10, np.float32)),
        seed=7,
    )
    return G, labels


def test_syn1_training_accuracy(syn1_small):
    G, labels = syn1_small
    g = graph_from_networkx(G)
    feat = padded_features(G, g)
    model = GcnEncoderNode(
        input_dim=10, hidden_dim=20, embedding_dim=20,
        label_dim=max(labels) + 1, num_layers=3,
    )
    out = train_node_classifier(
        model, g, feat, labels,
        TrainConfig(num_epochs=600, scan_chunk=100), seed=1,
    )
    # reference-level performance on a reduced syn1 (SURVEY §6 parity target)
    assert out["result_test"]["acc"] > 0.8, out["result_test"]
    assert out["result_train"]["acc"] > 0.85, out["result_train"]


def test_checkpoint_roundtrip(tmp_path, syn1_small):
    G, labels = syn1_small
    g = graph_from_networkx(G)
    feat = padded_features(G, g)
    model = GcnEncoderNode(
        input_dim=10, hidden_dim=8, embedding_dim=8,
        label_dim=max(labels) + 1, num_layers=3,
    )
    out = train_node_classifier(
        model, g, feat, labels, TrainConfig(num_epochs=5, scan_chunk=5), seed=0
    )
    cg = {
        "adj": np.zeros((1, 4, 4), np.float32),
        "feat": np.ones((1, 4, 10), np.float32),
        "label": np.zeros((1, 4), np.int32),
        "pred": out["ypred"][:, :4],
        "train_idx": out["train_idx"],
    }
    prefix = gen_prefix("testds", "base", 8, 8)
    save_checkpoint(str(tmp_path), prefix, out["params"], cg_dict=cg,
                    meta={"task": "node"})
    loaded = load_checkpoint(str(tmp_path), prefix, params_template=out["params"])
    flat_a = jax.tree_util.tree_leaves(out["params"])
    flat_b = jax.tree_util.tree_leaves(loaded["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(loaded["cg"]["pred"], cg["pred"])
    np.testing.assert_array_equal(loaded["train_idx"], cg["train_idx"])


def test_checkpoint_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="train a model"):
        load_checkpoint(str(tmp_path), "nope_base_h20_o20")


def _toy_graph_dataset(rng, n_graphs=40):
    """Cycle vs star graphs — trivially separable by structure."""
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(6, 12))
        G = nx.cycle_graph(n) if i % 2 == 0 else nx.star_graph(n - 1)
        G.graph["label"] = i % 2
        for u in G.nodes():
            G.nodes[u]["feat"] = np.ones(4, np.float32)
        graphs.append(G)
    return graphs


def test_graph_classifier_learns(rng):
    graphs = _toy_graph_dataset(rng)
    batcher = GraphBatcher(graphs, normalize=False, max_num_nodes=12)
    model = GcnEncoderGraph(
        input_dim=4, hidden_dim=16, embedding_dim=16, label_dim=2, num_layers=3,
    )
    out = train_graph_classifier(
        model, batcher, TrainConfig(num_epochs=30, batch_size=10, eval_every=10),
        seed=0,
    )
    assert out["history"]["train_acc"][-1] > 0.9
    assert out["cg"] is not None
    assert out["cg"]["adj"].shape[1:] == (12, 12)
    # preds cover fewer graphs than adjs (reference contract,
    # train.py:166-190: 20 batches of tensors, 5 of preds)
    assert out["cg"]["pred"].shape[1] <= out["cg"]["adj"].shape[0]


def test_train_node_bcsr_path():
    """use_bcsr=True trains through the Pallas block-sparse kernel
    (interpret mode off-TPU) and produces finite, learning metrics."""
    G, labels, _ = gengraph.gen_syn1(
        nb_shapes=8,
        width_basis=40,
        feature_generator=featgen.ConstFeatureGen(np.ones(10, np.float32)),
        seed=3,
    )
    g = graph_from_networkx(G)
    feat = padded_features(G, g)
    model = GcnEncoderNode(
        input_dim=10, hidden_dim=8, embedding_dim=8,
        label_dim=int(max(labels)) + 1, num_layers=3,
    )
    cfg = TrainConfig(num_epochs=40, scan_chunk=20, use_bcsr=True)
    out = train_node_classifier(model, g, feat, np.asarray(labels), cfg, seed=0)
    assert np.all(np.isfinite(out["history"]["loss"]))
    # node padding may have grown to the BCSR block multiple
    assert out["ypred"].shape[1] >= g.num_nodes_padded
    assert out["history"]["loss"][-1] < out["history"]["loss"][0]


def test_train_node_bcsr_resident_path():
    """bcsr_resident="on" trains through the VMEM-resident stacked kernel
    (ops/pallas_resident, interpret mode off-TPU) and matches the
    learning behavior of the streaming BCSR path."""
    G, labels, _ = gengraph.gen_syn1(
        nb_shapes=8,
        width_basis=40,
        feature_generator=featgen.ConstFeatureGen(np.ones(10, np.float32)),
        seed=3,
    )
    g = graph_from_networkx(G)
    feat = padded_features(G, g)
    model = GcnEncoderNode(
        input_dim=10, hidden_dim=8, embedding_dim=8,
        label_dim=int(max(labels)) + 1, num_layers=3,
    )
    cfg = TrainConfig(num_epochs=40, scan_chunk=20, use_bcsr=True,
                      bcsr_resident="on")
    out = train_node_classifier(model, g, feat, np.asarray(labels), cfg, seed=0)
    assert np.all(np.isfinite(out["history"]["loss"]))
    assert out["history"]["loss"][-1] < out["history"]["loss"][0]
    # loss trajectory must track the streaming-kernel path (same math,
    # int8 tiles are exact for this unit-weight adjacency)
    cfg_s = TrainConfig(num_epochs=40, scan_chunk=20, use_bcsr=True,
                        bcsr_resident="off")
    out_s = train_node_classifier(model, g, feat, np.asarray(labels), cfg_s,
                                  seed=0)
    np.testing.assert_allclose(
        np.asarray(out["history"]["loss"]),
        np.asarray(out_s["history"]["loss"]),
        rtol=2e-2, atol=2e-3,
    )


def test_att_model_trains_on_bcsr_path(rng):
    """A GAT model with use_bcsr=True routes to BCSRAdj WITH a transpose
    plan (tile-gradient path) instead of crashing at trace time, and
    its loss trajectory matches the COO path (r5 fix: the static-weight
    BCSRAdj(m, m_t) fast path has no attention-score gradients)."""
    from tpugraph.core.graph import graph_from_dense
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.train.loop import TrainConfig, train_node_classifier

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    feat = rng.standard_normal((g.num_nodes_padded, 6)).astype(np.float32)
    labels = rng.integers(0, 3, n)
    model = GcnEncoderNode(input_dim=6, hidden_dim=8, embedding_dim=8,
                           label_dim=3, num_layers=2, att=True)
    cfg = TrainConfig(num_epochs=6, use_bcsr=True, bcsr_block=8,
                      scan_chunk=3)
    out = train_node_classifier(model, g, feat, labels, cfg, seed=0)
    cfg_coo = TrainConfig(num_epochs=6, scan_chunk=3)
    out_coo = train_node_classifier(model, g, feat, labels, cfg_coo,
                                    seed=0)
    np.testing.assert_allclose(out["history"]["loss"],
                               out_coo["history"]["loss"], rtol=2e-3)
