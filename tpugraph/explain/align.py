"""Explanation-alignment experiment (reference ``explain.py:503-533``):
learn a relaxed permutation P minimizing
``||P Xc - Xr|| + ||P Ac P^T - Ar||`` by Adam, initialized uniform with
the query-node correspondence pinned.

TPU-native: the whole optimization is one jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def align_explanations(
    ref_feat: np.ndarray,
    ref_adj: np.ndarray,
    ref_node_idx: int,
    curr_feat: np.ndarray,
    curr_adj: np.ndarray,
    curr_node_idx: int,
    num_steps: int = 1000,
    lr: float = 0.01,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns ``(P, aligned_adj, aligned_feat)``."""
    ra = jnp.asarray(ref_adj, jnp.float32)
    ca = jnp.asarray(curr_adj, jnp.float32)
    rf = jnp.asarray(ref_feat, jnp.float32)
    cf = jnp.asarray(curr_feat, jnp.float32)

    n_ref, n_curr = ra.shape[0], ca.shape[0]
    P0 = jnp.full((n_ref, n_curr), 1.0 / n_ref)
    P0 = P0.at[ref_node_idx, :].set(0.0)
    P0 = P0.at[:, curr_node_idx].set(0.0)
    P0 = P0.at[ref_node_idx, curr_node_idx].set(1.0)

    tx = optax.adam(lr, b1=0.5, b2=0.999)

    def loss_fn(P):
        feat_loss = jnp.linalg.norm(P @ cf - rf)
        aligned = P @ ca @ P.T
        return feat_loss + jnp.linalg.norm(aligned - ra)

    @jax.jit
    def run(P):
        opt_state = tx.init(P)

        def step(carry, _):
            P, o = carry
            loss, g = jax.value_and_grad(loss_fn)(P)
            updates, o = tx.update(g, o, P)
            P = optax.apply_updates(P, updates)
            return (P, o), loss

        (P, _), losses = jax.lax.scan(step, (P, opt_state), None,
                                      length=num_steps)
        return P, losses

    P, losses = run(P0)
    aligned_adj = P @ ca @ P.T
    aligned_feat = P @ cf
    return np.asarray(P), np.asarray(aligned_adj), np.asarray(aligned_feat)
