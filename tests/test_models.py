"""Model tests: sparse-vs-dense encoder parity, shapes, and loss behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpugraph.core.graph import graph_from_dense
from tpugraph.nn import (
    GraphConv,
    SparseAdj,
    GcnEncoderNode,
    GcnEncoderGraph,
    SoftPoolingGcnEncoder,
)
from tpugraph.nn.losses import (
    softmax_cross_entropy,
    node_cross_entropy,
    link_prediction_loss,
)


def random_graph(rng, n=25, p=0.2, d=7):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    x = rng.standard_normal((n, d)).astype(np.float32)
    return a, x


def pad_feats(x, n_pad):
    out = np.zeros((n_pad, x.shape[1]), dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


@pytest.mark.parametrize("att", [False, True])
@pytest.mark.parametrize("add_self", [False, True])
def test_graphconv_sparse_dense_parity(rng, att, add_self):
    a, x = random_graph(rng)
    n = a.shape[0]
    g = graph_from_dense(a)
    layer = GraphConv(
        input_dim=x.shape[1], output_dim=11, att=att, add_self=add_self,
        normalize_embedding=True,
    )
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(a))
    y_dense, att_dense = layer.apply(params, jnp.asarray(x), jnp.asarray(a))
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    x_pad = jnp.asarray(pad_feats(x, g.num_nodes_padded))
    y_sparse, att_sparse = layer.apply(params, x_pad, sp)
    np.testing.assert_allclose(
        np.asarray(y_sparse)[:n], np.asarray(y_dense), atol=1e-4
    )


def test_node_encoder_sparse_dense_parity(rng):
    a, x = random_graph(rng, n=30)
    n = a.shape[0]
    g = graph_from_dense(a)
    model = GcnEncoderNode(
        input_dim=x.shape[1], hidden_dim=20, embedding_dim=20, label_dim=4,
        num_layers=3,
    )
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(a))
    pred_dense, _ = model.apply(params, jnp.asarray(x), jnp.asarray(a))
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    x_pad = jnp.asarray(pad_feats(x, g.num_nodes_padded))
    pred_sparse, _ = model.apply(params, x_pad, sp)
    assert pred_dense.shape == (n, 4)
    np.testing.assert_allclose(
        np.asarray(pred_sparse)[:n], np.asarray(pred_dense), atol=1e-4
    )


def test_node_encoder_batched_dense(rng):
    a, x = random_graph(rng, n=20)
    model = GcnEncoderNode(
        input_dim=x.shape[1], hidden_dim=8, embedding_dim=8, label_dim=3,
        num_layers=3,
    )
    ab = jnp.asarray(a)[None]
    xb = jnp.asarray(x)[None]
    params = model.init(jax.random.PRNGKey(2), xb, ab)
    pred, att = model.apply(params, xb, ab)
    assert pred.shape == (1, 20, 3)
    assert len(att) == 3


def test_graph_encoder_shapes_and_masking(rng):
    b, n, d = 4, 16, 5
    adj = np.stack([random_graph(rng, n=n, d=d)[0] for _ in range(b)])
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    mask = np.ones((b, n), dtype=np.float32)
    mask[:, 10:] = 0.0
    model = GcnEncoderGraph(
        input_dim=d, hidden_dim=8, embedding_dim=8, label_dim=2, num_layers=3,
    )
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(adj))
    pred, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(adj), node_mask=jnp.asarray(mask)
    )
    assert pred.shape == (b, 2)
    # masked pooling: corrupting padded node features must not change output
    x2 = x.copy()
    x2[:, 10:] += 100.0
    # padded nodes must also be disconnected for invariance
    adj2 = adj.copy()
    adj2[:, 10:, :] = 0
    adj2[:, :, 10:] = 0
    x3 = x2.copy()
    pred_a, _ = model.apply(
        params, jnp.asarray(x2), jnp.asarray(adj2), node_mask=jnp.asarray(mask)
    )
    x2[:, 10:] -= 50.0
    pred_b, _ = model.apply(
        params, jnp.asarray(x2), jnp.asarray(adj2), node_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(pred_a), np.asarray(pred_b), atol=1e-5)


def test_diffpool_forward_and_linkpred(rng):
    b, n, d = 2, 20, 6
    adj = np.stack([random_graph(rng, n=n, d=d)[0] for _ in range(b)])
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    mask = np.ones((b, n), dtype=np.float32)
    model = SoftPoolingGcnEncoder(
        max_num_nodes=n, input_dim=d, hidden_dim=8, embedding_dim=8,
        label_dim=3, num_layers=3, assign_hidden_dim=8, assign_ratio=0.25,
        num_pooling=1,
    )
    params = model.init(jax.random.PRNGKey(4), jnp.asarray(x), jnp.asarray(adj))
    pred, assigns = model.apply(
        params, jnp.asarray(x), jnp.asarray(adj), node_mask=jnp.asarray(mask)
    )
    assert pred.shape == (b, 3)
    assert len(assigns) == 1
    assert assigns[0].shape == (b, n, int(n * 0.25))
    ll = link_prediction_loss(assigns[0], jnp.asarray(adj), jnp.asarray(mask))
    assert np.isfinite(float(ll))


def test_losses_match_torch_conventions(rng):
    logits = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 6))
    l = softmax_cross_entropy(logits, labels)
    # manual
    lp = jax.nn.log_softmax(logits)
    ref = -np.mean([lp[i, labels[i]] for i in range(6)])
    np.testing.assert_allclose(float(l), ref, rtol=1e-6)
    # weighted CE: torch normalizes by sum of selected weights
    w = jnp.asarray([1.0, 5.0, 1.0, 1.0])
    lw = softmax_cross_entropy(logits, labels, class_weight=w)
    sel = np.asarray(w)[np.asarray(labels)]
    refw = -np.sum([lp[i, labels[i]] * sel[i] for i in range(6)]) / sel.sum()
    np.testing.assert_allclose(float(lw), refw, rtol=1e-6)


def test_node_ce_mask(rng):
    logits = jnp.asarray(rng.standard_normal((1, 5, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 5)))
    mask = jnp.asarray([[1.0, 1, 1, 0, 0]])
    l_masked = node_cross_entropy(logits, labels, node_mask=mask)
    l_sub = node_cross_entropy(logits[:, :3], labels[:, :3])
    np.testing.assert_allclose(float(l_masked), float(l_sub), rtol=1e-6)
