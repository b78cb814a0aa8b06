"""Loss functions (reference ``models.py:318-328, 378-380, 583-617``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weight: Optional[jax.Array] = None,
    sample_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean softmax cross-entropy over the leading axes.

    ``class_weight`` reproduces torch's weighted ``nn.CrossEntropyLoss``
    normalization: sum(w_y * nll) / sum(w_y)  (used by ppi_essential with
    weight [1, 5], reference ``train.py:575``).  ``sample_mask`` excludes
    padding entries from both numerator and denominator.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[labels]
    else:
        w = jnp.ones_like(nll)
    if sample_mask is not None:
        w = w * sample_mask
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def node_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weight: Optional[jax.Array] = None,
    node_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-node CE (reference ``GcnEncoderNode.loss``, ``models.py:378-380``).
    ``logits [..., N, C]``, ``labels [..., N]``."""
    return softmax_cross_entropy(logits, labels, class_weight, node_mask)


def margin_loss(logits: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """Multi-label margin loss against the one-hot label (reference
    ``models.py:322-326`` / torch ``MultiLabelMarginLoss`` with a single
    positive class): mean over classes of max(0, 1 - x_y + x_j) for j != y,
    averaged over the batch."""
    x_y = jnp.take_along_axis(logits, labels[..., None], axis=-1)
    margins = jnp.maximum(0.0, 1.0 - x_y + logits)
    onehot = jax.nn.one_hot(labels, num_classes)
    margins = margins * (1.0 - onehot)
    return jnp.mean(jnp.sum(margins, axis=-1) / num_classes)


def link_prediction_loss(
    assign_tensor: jax.Array,
    adj: jax.Array,
    node_mask: Optional[jax.Array] = None,
    eps: float = 1e-7,
) -> jax.Array:
    """DiffPool auxiliary loss: BCE between ``min(S S^T, 1)`` and the
    adjacency, masked to real-node entries (reference ``models.py:583-616``)."""
    pred_adj = jnp.matmul(
        assign_tensor,
        jnp.swapaxes(assign_tensor, -1, -2),
        preferred_element_type=jnp.float32,
    )
    pred_adj = jnp.minimum(pred_adj, 1.0)
    bce = -adj * jnp.log(pred_adj + eps) - (1 - adj) * jnp.log(1 - pred_adj + eps)
    if node_mask is not None:
        pair_mask = node_mask[..., :, None] * node_mask[..., None, :]
        bce = bce * pair_mask
        num = jnp.sum(pair_mask)
    else:
        num = bce.size
    return jnp.sum(bce) / jnp.maximum(num, 1.0)
