"""Graph diffusion / propagation: ``(A_hat^T A_hat)^H x`` at kernel speed.

SGC- and APPNP-style models propagate features through the (normalized)
adjacency WITHOUT nonlinearities between hops — which makes the whole
propagation one fusable kernel.  :func:`diffuse` packs a
:class:`tpugraph.core.graph.Graph` once and runs all ``hops`` in a
single ``pallas_call`` (``ops.pallas_resident.spmm_power_resident``),
amortizing the per-call grid/resident constants H-fold: measured in-situ
at H=8 on TPU v5e, 1.89e10 edges/s banded / 1.10e9 powerlaw
(``bench_power_diag.py``; vs 6.1e9 / 9.8e8 for one fused pair).

The reference has no diffusion model family; its closest analog is the
dense k-hop reachability ``A^k`` of ``utils/graph_utils.py:147-158``.
This op exists because the TPU-native design makes it nearly free —
static weights only (precompute features for an SGC head, label
propagation, spectral smoothing), NOT for training-time message passing
(use GraphConv).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class DiffusionOperator:
    """A packed, reusable ``(S^T S)^H`` propagation operator.

    ``S`` is the (optionally sym-normalized) adjacency packed once into
    the single-stream pair layout; :meth:`__call__` runs any number of
    hops against any feature matrix.  For an undirected graph with
    ``normalize=True`` this is the standard GCN propagation matrix
    squared per hop (spectral radius <= 1, so no scaling is needed);
    with ``normalize=False`` a ``hop_scale`` of ``1/max_row_sum^2`` is
    applied to keep powers bounded in bf16.
    """

    def __init__(self, g, block: int = 256, normalize: bool = True,
                 k_pack: int = 128):
        from tpugraph import native
        from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
        from tpugraph.ops.pallas_resident import pack_pair, stack_bcsr

        s = np.asarray(g.senders)
        r = np.asarray(g.receivers)
        w = np.asarray(g.edge_weight, np.float32)
        n = g.num_nodes_padded
        if normalize:
            w = native.sym_normalize(r, s, w, n)
            tdt = jnp.bfloat16
            self.hop_scale = 1.0
        else:
            live = w != 0
            row_sum = np.zeros(n)
            np.add.at(row_sum, r[live], w[live])
            m = float(row_sum.max(initial=1.0))
            tdt = jnp.int8 if bool(
                np.all(w == np.rint(w)) and np.abs(w).max(initial=0) <= 127
            ) else jnp.bfloat16
            self.hop_scale = 1.0 / (m * m)
        m_ = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=tdt,
                           device=False)
        m_t = bcsr_transpose_host(s, r, w, n, block=block, tile_dtype=tdt,
                                  device=False)
        self.pair = pack_pair(stack_bcsr(m_, 1, k_pack),
                              stack_bcsr(m_t, 1, k_pack))
        self.k_pack = k_pack
        self.num_nodes = self.pair.num_nodes

    def __call__(self, x: jax.Array, hops: int,
                 interpret: Optional[bool] = None) -> jax.Array:
        """``(hop_scale * S^T S)^hops @ x`` — pad/truncate ``x`` rows to
        ``self.num_nodes`` first; bf16 in/out recommended."""
        from tpugraph.ops.pallas_resident import spmm_power_resident

        n, d = x.shape
        assert n == self.num_nodes, (n, self.num_nodes)
        return spmm_power_resident(
            self.pair, x, hops=hops, k_pack=self.k_pack,
            interpret=interpret, hop_scale=self.hop_scale,
        )


def diffuse(g, x: jax.Array, hops: int, block: int = 256,
            normalize: bool = True,
            interpret: Optional[bool] = None) -> jax.Array:
    """One-shot convenience: pack + propagate ``hops`` times.  For
    repeated use (e.g. sweeping H) build a :class:`DiffusionOperator`
    once."""
    op = DiffusionOperator(g, block=block, normalize=normalize)
    n, d = x.shape
    if n < op.num_nodes:
        x = jnp.pad(x, ((0, op.num_nodes - n), (0, 0)))
    return op(x, hops, interpret=interpret)[:n]
