"""Sparse message-passing primitives (XLA path).

The reference's hot op is the dense batched matmul ``y = adj @ x``
(reference ``models.py:70``).  Here the same contraction is expressed over a
padded COO edge list as gather + weighted ``segment_sum`` — XLA lowers this
to fused gather/scatter that is O(E * D) and shards by edge partitioning.
A Pallas block-sparse kernel (``tpugraph.ops.pallas_spmm``) provides the
MXU fast path behind the same API; this module is the portable reference
implementation and the autodiff fallback.

All functions take raw arrays (not Graph containers) so they can be used
inside ``vmap``/``shard_map`` with arbitrary masking applied upstream.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spmm(
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    x: jax.Array,
    num_nodes: Optional[int] = None,
) -> jax.Array:
    """Sparse matrix times dense matrix: ``y[i] = sum_e w_e * x[senders[e]]``
    over edges with ``receivers[e] == i``.

    Equivalent to dense ``A @ x`` with ``A[r, s] = w`` (reference
    ``models.py:70``).  Padding edges must have ``edge_weight == 0`` (they
    gather node 0 but contribute nothing).

    Args:
      x: float[N, D] node features.
    Returns:
      float[N, D].
    """
    n = num_nodes or x.shape[0]
    messages = x[senders] * edge_weight[:, None]
    return jax.ops.segment_sum(messages, receivers, num_segments=n)


def sddmm(
    senders: jax.Array,
    receivers: jax.Array,
    a: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Sampled dense-dense matmul: per-edge ``<a[senders[e]], b[receivers[e]]>``.

    The sparse form of the reference's GAT-style attention scores
    ``(x W_a)(x W_a)^T`` evaluated only on edge support (reference
    ``models.py:62-68``), and of the explainer's mask-gradient support.
    """
    return jnp.sum(a[senders] * b[receivers], axis=-1)


def segment_softmax(
    logits: jax.Array,
    segments: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically-stable softmax over edges grouped by ``segments``
    (e.g. per-receiver attention normalization). Padding edges (mask 0)
    receive weight 0."""
    if edge_mask is not None:
        logits = jnp.where(edge_mask > 0, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(logits, segments, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.exp(logits - seg_max[segments])
    if edge_mask is not None:
        exp = jnp.where(edge_mask > 0, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segments, num_segments=num_segments)
    return exp / jnp.maximum(denom[segments], 1e-16)


def sym_normalize_weights(
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """On-device symmetric normalization ``w_e / sqrt(deg_s * deg_r)`` —
    sparse analog of reference ``utils/graph_utils.py:40-44``."""
    deg = jax.ops.segment_sum(edge_weight, receivers, num_segments=num_nodes)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return edge_weight * inv_sqrt[senders] * inv_sqrt[receivers]
