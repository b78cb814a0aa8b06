"""Baseline explainers: gradient saliency and attention
(reference ``explain.py:125-133, 178-214, 717-738``)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _pad_bucket(sub_adj: np.ndarray, sub_feat: np.ndarray, multiple: int = 32):
    """Pad dense subgraphs up to a size bucket so XLA compiles once per
    bucket instead of once per distinct neighborhood size (padded nodes
    are isolated: zero adjacency rows/cols cannot reach the query)."""
    n = sub_adj.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    adj = np.zeros((n_pad, n_pad), dtype=np.float32)
    adj[:n, :n] = sub_adj
    feat = np.zeros((n_pad, sub_feat.shape[1]), dtype=np.float32)
    feat[:n] = sub_feat
    return adj, feat, n


_GRAD_FN_CACHE: dict = {}


def _jit_cache(kind: str, model_apply, graph_mode: bool, build):
    """One jitted function per (kind, model, mode) — reused across query
    nodes so each padding bucket compiles exactly once (and, on this
    platform, so per-node calls don't pay eager per-op dispatch)."""
    key = (kind, id(model_apply), graph_mode)
    if key not in _GRAD_FN_CACHE:
        _GRAD_FN_CACHE[key] = build()
    return _GRAD_FN_CACHE[key]


def _grad_fn_cache(model_apply, graph_mode: bool):
    def build():
        @jax.jit
        def adj_grad_fn(params, adj_in, x_in, node_i, lab_i):
            def loss(a, xx):
                ypred, _ = model_apply(params, xx, a)
                if graph_mode:
                    logit = jax.nn.softmax(ypred[0])
                else:
                    logit = jax.nn.softmax(ypred[0, node_i, :])
                return -jnp.log(logit[lab_i] + 1e-12)

            g = jnp.abs(jax.grad(loss, argnums=0)(adj_in, x_in)[0])
            return jax.nn.sigmoid(g + g.T)

        return adj_grad_fn

    return _jit_cache("adj_grad", model_apply, graph_mode, build)


def grad_saliency(
    model_apply,
    params,
    sub_adj: np.ndarray,
    sub_feat: np.ndarray,
    node_idx_new: int,
    pred_label: int,
    graph_mode: bool = False,
) -> np.ndarray:
    """Gradient baseline: one backward pass of ``-log p[pred_label]`` wrt
    the dense sub-adjacency; saliency = ``sigmoid(|dA| + |dA|^T) * A``
    (reference ``explain.py:125-133`` + ``adj_feat_grad`` ``:717-738``).

    Runs the model's dense path on the extracted subgraph, exactly like
    the reference (bucketed padding keeps recompiles to one per size
    bucket).
    """
    adj_p, x_p, n = _pad_bucket(np.asarray(sub_adj), np.asarray(sub_feat))
    adj = jnp.asarray(adj_p)[None]
    x = jnp.asarray(x_p)[None]

    adj_grad_fn = _grad_fn_cache(model_apply, graph_mode)
    sal = np.asarray(
        adj_grad_fn(params, adj, x, jnp.asarray(node_idx_new),
                    jnp.asarray(pred_label))
    )[:n, :n]
    return sal * np.asarray(sub_adj)


def grad_feat_saliency(
    model_apply,
    params,
    sub_adj: np.ndarray,
    sub_feat: np.ndarray,
    node_idx_new: int,
    pred_label: int,
    graph_mode: bool = False,
) -> np.ndarray:
    """Feature-gradient component of ``adj_feat_grad`` (reference
    ``explain.py:717-738``): d(-log p)/dx."""
    adj_p, x_p, n = _pad_bucket(np.asarray(sub_adj), np.asarray(sub_feat))
    adj = jnp.asarray(adj_p)[None]
    x = jnp.asarray(x_p)[None]

    def build():
        @jax.jit
        def feat_grad_fn(params, adj_in, x_in, node_i, lab_i):
            def loss(a, xx):
                ypred, _ = model_apply(params, xx, a)
                if graph_mode:
                    logit = jax.nn.softmax(ypred[0])
                else:
                    logit = jax.nn.softmax(ypred[0, node_i, :])
                return -jnp.log(logit[lab_i] + 1e-12)

            return jax.grad(loss, argnums=1)(adj_in, x_in)[0]

        return feat_grad_fn

    fn = _jit_cache("feat_grad", model_apply, graph_mode, build)
    return np.asarray(
        fn(params, adj, x, jnp.asarray(node_idx_new), jnp.asarray(pred_label))
    )[:n]


def _pad_stack(sub_adjs, sub_feats, multiple: int = 32):
    """Stack ragged dense subgraphs into one padded batch (shared bucket)."""
    ns = [a.shape[0] for a in sub_adjs]
    n_pad = ((max(ns) + multiple - 1) // multiple) * multiple
    q = len(sub_adjs)
    d = sub_feats[0].shape[1]
    adjs = np.zeros((q, n_pad, n_pad), dtype=np.float32)
    feats = np.zeros((q, n_pad, d), dtype=np.float32)
    for i, (a, f) in enumerate(zip(sub_adjs, sub_feats)):
        adjs[i, : ns[i], : ns[i]] = a
        feats[i, : ns[i]] = f
    return adjs, feats, ns


def grad_saliency_batch(
    model_apply,
    params,
    sub_adjs,
    sub_feats,
    node_idxs,
    pred_labels,
    graph_mode: bool = False,
):
    """All queries' gradient saliencies in ONE vmapped device call
    (the reference — and r1 — looped node-by-node, paying per-op
    dispatch; ``explain.py:295-299``).  Returns a list of ``[n_i, n_i]``
    saliency maps masked to edge support."""
    adjs, feats, ns = _pad_stack(sub_adjs, sub_feats)

    def build():
        @jax.jit
        def batch_fn(params, adjs, xs, nis, labs):
            def one(a, x, ni, lab):
                def loss(aa, xx):
                    ypred, _ = model_apply(params, xx[None], aa[None])
                    if graph_mode:
                        logit = jax.nn.softmax(ypred[0])
                    else:
                        logit = jax.nn.softmax(ypred[0, ni, :])
                    return -jnp.log(logit[lab] + 1e-12)

                g = jnp.abs(jax.grad(loss, argnums=0)(a, x))
                return jax.nn.sigmoid(g + g.T)

            return jax.vmap(one)(adjs, xs, nis, labs)

        return batch_fn

    fn = _jit_cache("adj_grad_batch", model_apply, graph_mode, build)
    sal = np.asarray(
        fn(params, jnp.asarray(adjs), jnp.asarray(feats),
           jnp.asarray(np.asarray(node_idxs, np.int32)),
           jnp.asarray(np.asarray(pred_labels, np.int32)))
    )
    return [sal[i, : n, : n] * np.asarray(sub_adjs[i])
            for i, n in enumerate(ns)]


def attention_saliency_batch(model_apply, params, sub_adjs, sub_feats):
    """All queries' attention saliencies in ONE vmapped device call."""
    adjs, feats, ns = _pad_stack(sub_adjs, sub_feats)

    def build():
        @jax.jit
        def batch_fn(params, adjs, xs):
            def one(a, x):
                _, att_all = model_apply(params, x[None], a[None])
                att_sum = sum(jnp.asarray(t)[0] for t in att_all)
                return jax.nn.sigmoid(att_sum)

            return jax.vmap(one)(adjs, xs)

        return batch_fn

    fn = _jit_cache("att_batch", model_apply, False, build)
    sal = np.asarray(fn(params, jnp.asarray(adjs), jnp.asarray(feats)))
    return [sal[i, : n, : n] * np.asarray(sub_adjs[i])
            for i, n in enumerate(ns)]


def attention_saliency(
    model_apply,
    params,
    sub_adj: np.ndarray,
    sub_feat: np.ndarray,
) -> np.ndarray:
    """Attention baseline for GAT-method models: per-layer attention
    matrices summed over layers, squashed and masked to edge support
    (reference ``explain.py:178-203, 208-214``; attention computed at
    ``models.py:62-68``)."""
    adj_p, x_p, n = _pad_bucket(np.asarray(sub_adj), np.asarray(sub_feat))
    adj = jnp.asarray(adj_p)[None]
    x = jnp.asarray(x_p)[None]

    def build():
        @jax.jit
        def att_fn(params, x_in, adj_in):
            _, att_all = model_apply(params, x_in, adj_in)
            att_sum = sum(jnp.asarray(a)[0] for a in att_all)
            return jax.nn.sigmoid(att_sum)

        return att_fn

    fn = _jit_cache("att", model_apply, False, build)
    sal = np.asarray(fn(params, x, adj))[:n, :n]
    return sal * np.asarray(sub_adj)
