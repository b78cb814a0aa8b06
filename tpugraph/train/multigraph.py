"""Multigraph node classification (reference
``train_node_classifier_multigraph``, ``train.py:364-484``): one shared
model trained over a stack of same-size graphs (the Enron time slices),
with an independent node-level train/test split per graph.

TPU design: graphs stack into a ``BatchedGraphs`` pytree; the forward is
``vmap``-ed over the graph axis and the whole epoch is one jitted scan
step (the reference hardcodes Enron's ``reshape(10, 146, 6)`` —
``train.py:419-421``; this version is shape-generic).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpugraph.core.graph import Graph, batch_graphs
from tpugraph.nn.layers import SparseAdj
from tpugraph.nn.losses import node_cross_entropy
from tpugraph.train.loop import TrainConfig, _opt_config, split_nodes
from tpugraph.train.metrics import eval_node
from tpugraph.train.optim import build_optimizer


def train_node_classifier_multigraph(
    model,
    graphs: List[Graph],
    feats: np.ndarray,     # [G, N_pad, D]
    labels: np.ndarray,    # [G, N_real] (or [G, N_pad])
    cfg: TrainConfig,
    seed: int = 0,
    log_fn=None,
) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    bg = batch_graphs(graphs)
    n_graphs = len(graphs)
    n_pad = graphs[0].num_nodes_padded
    n_real = int(graphs[0].n_node)

    labels_pad = np.zeros((n_graphs, n_pad), dtype=np.int32)
    labels_pad[:, : labels.shape[1]] = np.asarray(labels, dtype=np.int32)

    train_masks = np.zeros((n_graphs, n_pad), dtype=np.float32)
    test_masks = np.zeros((n_graphs, n_pad), dtype=np.float32)
    train_idx_all, test_idx_all = [], []
    for gi in range(n_graphs):
        tr, te = split_nodes(n_real, cfg.train_ratio, rng)
        train_idx_all.append(tr)
        test_idx_all.append(te)
        train_masks[gi, tr] = 1.0
        test_masks[gi, te] = 1.0

    x = jnp.asarray(feats, jnp.float32)
    y = jnp.asarray(labels_pad)
    trm = jnp.asarray(train_masks)
    tem = jnp.asarray(test_masks)

    def fwd(p, xg, s, r, w):
        logits, _ = model.apply(p, xg, SparseAdj(s, r, w))
        return logits

    vfwd = jax.vmap(fwd, in_axes=(None, 0, 0, 0, 0))

    params = model.init(
        jax.random.PRNGKey(seed),
        x[0],
        SparseAdj(bg.senders[0], bg.receivers[0], bg.edge_weight[0]),
    )
    tx = build_optimizer(_opt_config(cfg))
    opt_state = tx.init(params)

    # data tensors are jit arguments, not closures (no HLO constants)
    @partial(jax.jit, static_argnames="length")
    def run_chunk(p, s, x, bg, y, trm, tem, length):
        def loss_fn(p):
            logits = vfwd(p, x, bg.senders, bg.receivers, bg.edge_weight)
            return node_cross_entropy(logits, y, node_mask=trm), logits

        def epoch_step(carry, _):
            p, s = carry
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            pred = jnp.argmax(logits, axis=-1)
            correct = (pred == y).astype(jnp.float32)
            tr_acc = jnp.sum(correct * trm) / jnp.maximum(jnp.sum(trm), 1.0)
            te_acc = jnp.sum(correct * tem) / jnp.maximum(jnp.sum(tem), 1.0)
            return (p, s), (loss, tr_acc, te_acc)

        return jax.lax.scan(epoch_step, (p, s), None, length=length)

    history = {"loss": [], "train_acc": [], "test_acc": []}
    begin = time.time()
    done = 0
    while done < cfg.num_epochs:
        chunk = min(cfg.scan_chunk, cfg.num_epochs - done)
        (params, opt_state), (l, a, b) = run_chunk(
            params, opt_state, x, bg, y, trm, tem, chunk
        )
        done += chunk
        history["loss"].extend(np.asarray(l).tolist())
        history["train_acc"].extend(np.asarray(a).tolist())
        history["test_acc"].extend(np.asarray(b).tolist())
        if log_fn:
            log_fn(done, {"loss": history["loss"][-1],
                          "train_acc": history["train_acc"][-1],
                          "test_acc": history["test_acc"][-1]})
    elapsed = time.time() - begin

    logits = jax.jit(vfwd)(params, x, bg.senders, bg.receivers, bg.edge_weight)
    ypred = np.asarray(logits)
    result_train, result_test = eval_node(
        ypred[:, :n_real],
        labels_pad[:, :n_real],
        train_idx_all[0],
        test_idx_all[0],
    )
    return {
        "params": params,
        "ypred": ypred,
        "train_idx": np.asarray(train_idx_all),
        "test_idx": np.asarray(test_idx_all),
        "history": history,
        "result_train": result_train,
        "result_test": result_test,
        "elapsed": elapsed,
    }
