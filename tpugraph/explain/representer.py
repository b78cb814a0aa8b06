"""Representer-point prototype selection (reference ``explain.py:404-488``):
scores training instances by the gradient of the loss at the prediction
layer — alpha_i = d loss / d pred_i — highlighting instances that most
support/oppose the decision.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from tpugraph.nn.losses import node_cross_entropy


_JIT_CACHE: Dict = {}


def representer_scores(
    model_apply,
    params,
    adj: np.ndarray,
    feat: np.ndarray,
    label: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Returns ``alpha`` = d CE / d logits (the reference's ``preds_grad``,
    ``explain.py:465-488``) plus embeddings and predictions, evaluated on
    the dense cg tensors."""
    x = jnp.asarray(feat, jnp.float32)
    a = jnp.asarray(adj, jnp.float32)
    y = jnp.asarray(label)

    fn = _JIT_CACHE.get(id(model_apply))
    if fn is None:

        @jax.jit
        def fn(params, x, a, y):
            logits, _ = model_apply(params, x, a)
            alpha = jax.grad(lambda lg: node_cross_entropy(lg, y))(logits)
            return alpha, logits

        _JIT_CACHE[id(model_apply)] = fn

    alpha, logits = fn(params, x, a, y)
    return {
        "alpha": np.asarray(alpha),
        "pred": np.asarray(logits),
    }
