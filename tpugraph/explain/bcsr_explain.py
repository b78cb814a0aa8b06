"""Tile-space GNNExplainer: mask optimization on the Pallas BCSR fast path.

The vmapped COO explainer (``explain/module.py``) is right for many small
k-hop queries.  At large-graph scale (1e5+ nodes, 1e6+ edges) each of its
optimization steps runs the ``segment_sum`` aggregation path, measured
~64x slower than the Pallas BCSR kernel on this chip (BENCH_r01).  Here
the learnable mask lives in TILE SPACE:

  * logits ``float32[T, B, B]`` over the BCSR support,
  * symmetrized as ``(L + L_partner^T) / 2`` via the transpose-partner
    permutation — exactly the reference's dense ``(M + M^T) / 2``
    parametrization (``explainer/explain.py:645-678``) restricted to the
    nonzero tiles,
  * masked adjacency ``W = base_tiles * act(sym) * (1 - I)`` — a fused
    elementwise over tiles,
  * the frozen model forward/backward runs through
    :func:`tpugraph.ops.pallas_spmm.bcsr_matvec_dw`, whose backward emits
    the mask gradient with an on-support SDDMM — every FLOP on the MXU.

Loss terms, coefficients, and initialization match the reference
(``explain.py:624-631, 633-663, 740-820``) exactly as in the COO module;
see :func:`tpugraph.explain.module.explain_loss` for the normalization
argument.  The trajectory is therefore the same function class — the COO
and tile parametrizations differ only by gradient scaling that Adam
normalizes away (verified in ``tests/test_explain.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpugraph.explain.module import ExplainConfig, _act, _binary_ent
from tpugraph.nn.layers import BCSRAdj
from tpugraph.ops.bcsr import BCSR, BCSRTranspose


class BCSRMaskState(NamedTuple):
    """Learnable explainer parameters in tile space (a pytree)."""

    tile_logits: jax.Array  # float32[T, B, B]
    feat_logits: jax.Array  # float32[D]


def init_tile_masks(
    key: jax.Array,
    num_tiles: int,
    block: int,
    feat_dim: int,
    num_sub_nodes: jax.Array,
    cfg: ExplainConfig,
) -> BCSRMaskState:
    """Reference init (``explain.py:633-663``): mask ~ N(1, relu_gain *
    sqrt(2 / 2n)); feat mask = 0.  Off-support logits are initialized too
    but never influence anything (base weights there are zero)."""
    n = jnp.maximum(num_sub_nodes.astype(jnp.float32), 1.0)
    std = math.sqrt(2.0) * jnp.sqrt(2.0 / (2.0 * n))
    tiles = 1.0 + std * jax.random.normal(key, (num_tiles, block, block))
    return BCSRMaskState(tiles, jnp.zeros((feat_dim,), jnp.float32))


def masked_tiles(
    base: BCSR,
    sym_partner: jax.Array,
    state: BCSRMaskState,
    cfg: ExplainConfig,
    node_keep: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """``(W, gate, keep)``: masked tile values, the symmetric gate, and
    the per-tile support restriction (None when unrestricted).

    ``W = base * act(sym(L)) * (1 - I)`` — reference ``_masked_adj``
    (``explain.py:665-678``) in block-sparse form.  The diagonal zeroing
    only applies inside diagonal tiles (row block == col block).

    ``node_keep`` (float[N] 0/1) restricts the support to the query's
    k-hop subgraph WITHOUT repacking: an edge survives iff both
    endpoints are kept (the reference's ``adj[neighbors][:, neighbors]``
    slice, ``explain.py:492-501``), expressed per tile as the outer
    product of the row-block and col-block node-mask slices.  This is
    what lets a single cached full-graph BCSR serve every query.
    """
    L = state.tile_logits
    sym = 0.5 * (L + jnp.transpose(L[sym_partner], (0, 2, 1)))
    gate = _act(sym, cfg.mask_act)
    is_diag_tile = (base.row_of == base.col_blk)[:, None, None]
    offdiag = 1.0 - is_diag_tile * jnp.eye(base.block, dtype=gate.dtype)
    w = base.tiles * gate * offdiag
    keep = None
    if node_keep is not None:
        nm = node_keep.astype(w.dtype).reshape(-1, base.block)
        keep = nm[base.row_of][:, :, None] * nm[base.col_blk][:, None, :]
        w = w * keep
    return w, gate, keep


def bcsr_mask_density(base: BCSR, w_tiles: jax.Array) -> jax.Array:
    """sum(masked) / sum(adj) (reference ``explain.py:680-683``)."""
    return jnp.sum(w_tiles) / jnp.maximum(jnp.sum(base.tiles), 1e-12)


def bcsr_explain_loss(
    probs: jax.Array,
    w_tiles: jax.Array,
    gate: jax.Array,
    base: BCSR,
    state: BCSRMaskState,
    cfg: ExplainConfig,
    gt_label: jax.Array,
    pred_label_vec: jax.Array,
    num_sub_nodes: jax.Array,
    graph_mode: bool = False,
    keep: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The 5-term objective in tile space (reference ``explain.py:740-820``).

    Each directed edge is one support entry, so sums over ``gate *
    support`` equal the COO module's sums over live directed edges."""
    pred_loss = -jnp.log(probs[gt_label] + 1e-12)

    support = (base.tiles != 0).astype(jnp.float32)
    if keep is not None:
        support = support * keep
    size_loss = cfg.coeff_size * jnp.sum(gate * support)
    n2 = jnp.maximum(num_sub_nodes.astype(jnp.float32) ** 2, 1.0)
    mask_ent_loss = cfg.coeff_ent * jnp.sum(_binary_ent(gate) * support) / n2

    feat_gate = (
        jax.nn.sigmoid(state.feat_logits) if cfg.use_sigmoid else state.feat_logits
    )
    feat_size_loss = cfg.coeff_feat_size * jnp.mean(feat_gate)
    feat_ent_loss = cfg.coeff_feat_ent * jnp.mean(_binary_ent(feat_gate))

    if graph_mode:
        lap_loss = jnp.asarray(0.0)
    else:
        # 0.5 * sum_e w_e (y_s - y_r)^2 with y gathered per tile block:
        # entry (i, j) of tile t couples receiver row_of[t]*B+i with
        # sender col_blk[t]*B+j.
        yb = pred_label_vec.astype(jnp.float32).reshape(
            base.num_row_blocks, base.block
        )
        y_row = yb[base.row_of]  # [T, B] receiver labels
        y_col = yb[base.col_blk]  # [T, B] sender labels
        diff = y_col[:, None, :] - y_row[:, :, None]
        lap_quad = 0.5 * jnp.sum(w_tiles * diff * diff)
        lap_loss = cfg.coeff_lap * lap_quad / n2

    total = pred_loss + size_loss + lap_loss + mask_ent_loss + feat_size_loss
    terms = {
        "pred": pred_loss,
        "size": size_loss,
        "ent": mask_ent_loss,
        "feat_size": feat_size_loss,
        "feat_ent": feat_ent_loss,
        "lap": lap_loss,
        "total": total,
    }
    return total, terms


def run_bcsr_mask_optimization(
    model_apply,
    params,
    base: BCSR,
    tp: BCSRTranspose,
    sym_partner: jax.Array,
    x: jax.Array,
    node_idx: jax.Array,
    gt_label: jax.Array,
    pred_label_vec: jax.Array,
    num_sub_nodes: jax.Array,
    key: jax.Array,
    cfg: ExplainConfig,
    graph_mode: bool = False,
    spmm_dtype=None,
    node_keep: Optional[jax.Array] = None,
) -> Tuple[BCSRMaskState, jax.Array, Dict[str, jax.Array]]:
    """Full mask optimization as one ``lax.scan`` on the BCSR fast path.

    Pure function — jit it with ``base``/``tp``/``sym_partner``/``x`` as
    ARGUMENTS (closing over tile arrays bakes them into the HLO; see
    ``ops/pallas_spmm.bcsr_matvec``).  Returns (final state, final masked
    tiles, per-epoch loss-term history).

    ``spmm_dtype`` (e.g. ``jnp.bfloat16``) casts the masked tiles fed to
    the SpMM/SDDMM kernels, halving their HBM traffic; mask logits, the
    loss, and the optimizer stay f32 (autodiff casts the tile cotangent
    back up).
    """
    state = init_tile_masks(
        key, base.num_tiles, base.block, x.shape[-1], num_sub_nodes, cfg
    )
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(state)

    def loss_fn(s):
        w_tiles, gate, keep = masked_tiles(base, sym_partner, s, cfg,
                                           node_keep)
        xx = x
        if cfg.mask_features:
            feat_gate = (
                jax.nn.sigmoid(s.feat_logits)
                if cfg.use_sigmoid
                else s.feat_logits
            )
            xx = x * feat_gate
        w_run = w_tiles if spmm_dtype is None else w_tiles.astype(spmm_dtype)
        masked = dataclasses.replace(base, tiles=w_run)
        # W^T once per step (all L layers share one masked adjacency);
        # layer backwards then skip their per-layer permute+transpose
        from tpugraph.ops.bcsr import transpose_tiles

        masked_t = BCSR(
            tiles=jax.lax.stop_gradient(transpose_tiles(w_run, tp)),
            col_blk=tp.col_blk, row_ptr=tp.row_ptr, row_of=tp.row_of,
            num_nodes=tp.num_nodes, block=tp.block,
        )
        ypred, _ = model_apply(params, xx, BCSRAdj(masked, masked_t, tp))
        if graph_mode:
            probs = jax.nn.softmax(ypred if ypred.ndim == 1 else ypred[0])
        else:
            probs = jax.nn.softmax(ypred[node_idx])
        total, terms = bcsr_explain_loss(
            probs, w_tiles, gate, base, s, cfg, gt_label, pred_label_vec,
            num_sub_nodes, graph_mode=graph_mode, keep=keep,
        )
        # density from the already-materialized masked tiles — a separate
        # post-update masked_tiles() would re-touch the [T, B, B] buffers
        # (HBM-bound) purely for logging
        terms["density"] = bcsr_mask_density(base, w_tiles)
        return total, terms

    def step(carry, _):
        s, o = carry
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(s)
        updates, o = tx.update(grads, o, s)
        s = optax.apply_updates(s, updates)
        return (s, o), terms

    (state, _), history = jax.lax.scan(
        step, (state, opt_state), None, length=cfg.num_epochs
    )
    w_tiles, _, _ = masked_tiles(base, sym_partner, state, cfg, node_keep)
    return state, w_tiles, history


def tiles_to_edge_weights(
    m: BCSR,
    tiles: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
) -> np.ndarray:
    """Host-side: read per-directed-edge values out of tile space.

    Vectorized lookup: tile of edge (s -> r) is the one at block
    (r // B, s // B); value sits at (r % B, s % B) inside it."""
    tiles = np.asarray(tiles)
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    b = m.block
    n_blocks = m.num_row_blocks
    row = np.asarray(m.row_of).astype(np.int64)
    col = np.asarray(m.col_blk).astype(np.int64)
    tile_key = row * n_blocks + col
    # first occurrence wins: real tiles precede appended padding tiles,
    # and a padding tile may share block coords with a real one
    lut = np.full(n_blocks * n_blocks, -1, dtype=np.int64)
    rev = np.argsort(tile_key, kind="stable")[::-1]
    lut[tile_key[rev]] = rev
    edge_key = (receivers // b).astype(np.int64) * n_blocks + senders // b
    t_idx = lut[edge_key]
    ok = t_idx >= 0
    out = np.zeros(len(senders), dtype=np.float32)
    out[ok] = tiles[t_idx[ok], receivers[ok] % b, senders[ok] % b]
    return out
