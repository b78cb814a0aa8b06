"""Tensor parallelism: hidden-dimension weight sharding via GSPMD.

The reference has no TP (SURVEY §2.2 — and its hidden dims are 20, so it
gains nothing there).  This module exists for wide-hidden configurations
(e.g. PPI-scale feature dims), where the per-layer ``[N, H] @ [H, H']``
matmuls dominate: kernels are sharded on their output (column) dimension
over a ``model`` mesh axis and XLA's SPMD partitioner propagates the
feature-dim sharding through the stack, inserting the (all_gather /
reduce_scatter) collectives where layers meet reductions — the idiomatic
TPU approach (annotate shardings, let XLA place collectives) rather than
hand-written splits.

Compose with data/edge parallelism on a 2-D ``("data", "model")`` mesh:
edge arrays shard over ``data``, weights over ``model``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for column-parallel weights.

    2-D kernels shard on their last (output) dim, matching 1-D biases on
    their only dim — but only when the dim divides the mesh axis size
    (prediction heads with tiny label dims stay replicated).
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def leaf_spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 2 and shape[1] % n == 0:
            return NamedSharding(mesh, P(None, axis))
        if len(shape) == 1 and shape[0] % n == 0 and shape[0] >= n:
            return NamedSharding(mesh, P(axis))
        return repl

    return jax.tree_util.tree_map(leaf_spec, params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Lay parameters out tensor-parallel (device_put with
    :func:`tp_shardings`).  Any jitted computation consuming them then
    runs SPMD-partitioned — forward, backward, and optimizer updates keep
    the sharding without further annotation."""
    return jax.device_put(params, tp_shardings(params, mesh, axis))


def make_tp_node_train_step(model, tx, mesh: Mesh, axis: str = "model",
                            class_weight=None):
    """Full-batch node-classification train step with tensor-parallel
    parameters.  Pass params/opt_state through :func:`shard_params_tp`
    first; data arguments are replicated.  Elementwise optimizer updates
    preserve the weight shardings across steps."""
    import optax

    from tpugraph.nn.layers import SparseAdj
    from tpugraph.nn.losses import node_cross_entropy

    repl = NamedSharding(mesh, P())

    def step(params, opt_state, senders, receivers, weights, x, y, mask):
        sp = SparseAdj(senders, receivers, weights)

        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(
                logits, y, class_weight=class_weight, node_mask=mask
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # no explicit in_shardings: GSPMD propagates from the committed
    # tensor-parallel param layout (shard_params_tp) and replicated data
    return jax.jit(step)
