"""Graph convolution layers.

``GraphConv`` re-implements the computation of the reference layer
(reference ``models.py:9-80``): ``y = (A @ x) @ W [+ x @ W_self] [+ b]``
with optional L2 embedding normalization and optional GAT-style
multiplicative attention ``A <- A * (x W_a)(x W_a)^T``
(reference ``models.py:62-68``).

TPU-native twist: the layer is representation-polymorphic.  The adjacency
argument is either

* a dense ``[..., N, N]`` array (MXU path for small batched graphs, and
  the oracle for parity tests), or
* a :class:`SparseAdj` padded COO edge list, in which case aggregation is
  gather + ``segment_sum`` (XLA) or the Pallas block-sparse kernel, and
  attention is an SDDMM evaluated only on edge support.

Parameters are identical across representations, so a model trained on the
sparse path can be evaluated on the dense oracle and vice versa.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpugraph.nn.initializers import xavier_relu_uniform
from tpugraph.ops.message import spmm, sddmm
from tpugraph.ops.dense import dense_spmm


class SparseAdj(NamedTuple):
    """Padded COO adjacency for one graph (no leading batch axis — use
    ``vmap`` for batches).  ``weight`` must be 0 on padding edges."""

    senders: jax.Array    # int32[E_pad]
    receivers: jax.Array  # int32[E_pad]
    weight: jax.Array     # float32[E_pad]


import dataclasses as _adj_dataclasses


@_adj_dataclasses.dataclass
class BCSRAdj:
    """Block-sparse adjacency for the Pallas MXU fast path
    (``tpugraph.ops.pallas_spmm``).  Feature dims are lane-padded to 128
    internally.  Two flavors:

    * static weights — pass ``m_t`` (BCSR of A^T, built with
      ``bcsr_transpose_host``): fastest, but gradients do not flow into
      the tile values.  ``k_pack > 1`` selects the packed double-buffered
      kernel (``m``/``m_t`` must be ``bcsr_pad_rows``-padded).
    * differentiable weights — pass ``tp`` (a
      ``tpugraph.ops.bcsr.bcsr_transpose_plan``): gradients flow into
      ``m.tiles`` via an on-support SDDMM, enabling learned masked
      adjacencies (the explainer) and GAT attention on this path.

    Registered pytree: ``k_pack`` is static metadata (it selects the
    kernel at trace time).
    """

    m: "object"          # BCSR
    m_t: "object" = None  # BCSR of A^T (static-weights fast path)
    tp: "object" = None   # BCSRTranspose plan (differentiable-weights path)
    k_pack: int = 0       # static: >1 = packed kernel on the static path


jax.tree_util.register_dataclass(
    BCSRAdj,
    data_fields=["m", "m_t", "tp"],
    meta_fields=["k_pack"],
)


import dataclasses as _dataclasses


@_dataclasses.dataclass
class HaloAdj:
    """Per-device view of a node-partitioned adjacency with boundary-only
    halo exchange — the multi-chip scaling path for graphs too large to
    replicate (SURVEY §2.2 "long-context analog").

    Used INSIDE ``shard_map``: each device owns a contiguous node shard
    (features ``x [Ns, D]`` stay sharded across ALL layers) and the edges
    that target its nodes.  The layer sends exactly the boundary features
    peers need (``all_to_all`` over ICI, volume O(boundary) not O(N)),
    then aggregates its local edges from ``[local | halo]``.  Build the
    plan host-side with ``tpugraph.parallel.spmd.build_halo_plan`` and
    slice per device (``HaloPlan`` arrays sharded over their first axis).
    """

    send_idx: jax.Array         # int32[n_dev, H] — my nodes each peer needs
    sender_slot: jax.Array      # int32[E_max] — per-edge index into [local|halo]
    receivers_local: jax.Array  # int32[E_max] — local receiver of each edge
    weight: jax.Array           # float32[E_max] — 0 on padding edges
    axis: str = "data"          # mesh axis name (static)


jax.tree_util.register_dataclass(
    HaloAdj,
    data_fields=["send_idx", "sender_slot", "receivers_local", "weight"],
    meta_fields=["axis"],
)


@_dataclasses.dataclass
class HaloBCSRAdj:
    """Per-device view of a node-partitioned adjacency whose local edges
    are packed as a rectangular BCSR over ``[local | halo]`` columns —
    the composition of the Pallas MXU kernel with the halo-exchange
    multi-chip path (VERDICT r2 item 3).

    Used INSIDE ``shard_map`` like :class:`HaloAdj`: the layer sends the
    boundary features peers need (``all_to_all`` over ICI), concatenates
    ``[x_local | halo]``, and aggregates with the block-sparse Pallas
    SpMM instead of ``segment_sum`` — so sharded training runs at kernel
    speed, not COO speed.  Build with
    ``tpugraph.parallel.spmd.build_halo_bcsr`` (host-side; stacks
    per-device BCSRs over the mesh axis).

    ``tp`` (a ``bcsr_transpose_plan`` of ``m``) enables GAT attention at
    kernel speed on this path: scores are an on-support SDDMM over the
    ``[local | halo]`` support (the sharded analog of reference
    ``models.py:62-68``), and tile gradients flow via the SDDMM VJP.
    """

    send_idx: jax.Array  # int32[n_dev, H] — my nodes each peer needs
    m: "object"          # BCSR of local edges: rows=[Ns], cols=[Ns+halo]
    m_t: "object"        # BCSR of the transpose (backward dx)
    tp: "object" = None  # BCSRTranspose plan of m (GAT / diff-weights)
    axis: str = "data"   # mesh axis name (static)


jax.tree_util.register_dataclass(
    HaloBCSRAdj,
    data_fields=["send_idx", "m", "m_t", "tp"],
    meta_fields=["axis"],
)


@_dataclasses.dataclass
class HaloOverlapAdj:
    """Split variant of :class:`HaloAdj` that OVERLAPS the boundary
    exchange with local aggregation (BASELINE.json north star; SURVEY §7
    "halo exchange overlap").

    The shard's edges are split host-side
    (``tpugraph.parallel.spmd.split_halo_plan``) into the local-local set
    (both endpoints in this shard — the vast majority on any decent
    partition) and the halo-dependent set.  The local ``segment_sum``
    has NO data dependence on the ``all_to_all``, so XLA schedules the
    collective concurrently with it; the halo contribution is added when
    the exchange lands.  Numerics are identical to :class:`HaloAdj`
    (same edges, same order-independent float sums).
    """

    send_idx: jax.Array  # int32[n_dev, H] — my nodes each peer needs
    s_loc: jax.Array     # int32[EL] — local sender of each local edge
    r_loc: jax.Array     # int32[EL] — local receiver (w=0 on padding)
    w_loc: jax.Array     # float32[EL]
    h_slot: jax.Array    # int32[EH] — halo-buffer index of each sender
    r_halo: jax.Array    # int32[EH] — local receiver of each halo edge
    w_halo: jax.Array    # float32[EH]
    axis: str = "data"   # mesh axis name (static)


jax.tree_util.register_dataclass(
    HaloOverlapAdj,
    data_fields=["send_idx", "s_loc", "r_loc", "w_loc",
                 "h_slot", "r_halo", "w_halo"],
    meta_fields=["axis"],
)


@_dataclasses.dataclass
class HaloBCSROverlapAdj:
    """Split variant of :class:`HaloBCSRAdj`: the local-local edges live
    in a SQUARE per-shard BCSR (``m_loc``) whose Pallas SpMM has no data
    dependence on the ``all_to_all``, so the kernel runs while the
    exchange is in flight; the halo-dependent edges live in a small
    rectangular BCSR (``m_halo``, cols = halo buffer) applied when the
    collective lands.  Build with
    ``tpugraph.parallel.spmd.build_halo_bcsr_overlap``.
    """

    send_idx: jax.Array   # int32[n_dev, H]
    m_loc: "object"       # BCSR local edges: rows=[Ns], cols=[Ns]
    m_loc_t: "object"     # transpose (backward dx)
    m_halo: "object"      # BCSR halo edges: rows=[Ns], cols=[halo buf]
    m_halo_t: "object"    # transpose (backward d_halo)
    tp_loc: "object" = None   # BCSRTranspose plan of m_loc (GAT)
    tp_halo: "object" = None  # BCSRTranspose plan of m_halo (GAT)
    axis: str = "data"    # mesh axis name (static)


jax.tree_util.register_dataclass(
    HaloBCSROverlapAdj,
    data_fields=["send_idx", "m_loc", "m_loc_t", "m_halo", "m_halo_t",
                 "tp_loc", "tp_halo"],
    meta_fields=["axis"],
)


@_dataclasses.dataclass
class StackedAdj:
    """VMEM-resident column-stacked adjacency
    (``tpugraph.ops.pallas_resident``): x and the output accumulator stay
    in VMEM for the whole kernel grid, so the only HBM stream is the
    (int8/bf16) tiles — the fast path for low-locality (power-law)
    graphs, where the streaming kernels' per-tile x gather is as large as
    the tile stream itself.  STATIC weights only (training aggregation);
    the explainer/GAT tile-gradient paths stay on :class:`BCSRAdj`.
    Gate on ``pallas_resident.resident_fits`` (x + out must fit VMEM).
    """

    st: "object"          # BCSRStacked of A
    st_t: "object"        # BCSRStacked of A^T (backward dx)
    k_pack: int = 16      # static: tiles per grid step


jax.tree_util.register_dataclass(
    StackedAdj,
    data_fields=["st", "st_t"],
    meta_fields=["k_pack"],
)


@_dataclasses.dataclass
class PacketAdj:
    """Edge-packet adjacency (``tpugraph.ops.packets`` /
    ``ops.pallas_packets``): ~1.5 KB HBM per 128-edge packet instead of a
    131 KB dense tile, and a ~1-3 s pack with NO tile materialization —
    the pack-latency-sensitive low-locality path (BENCH_r03: 2.3e8
    edges/s steady-state vs 9.4e8 resident, but 2.5 s pack vs 72 s;
    ``TrainConfig.bcsr_format="auto"`` picks by total-time cost model).
    STATIC weights only (training aggregation)."""

    p: "object"    # EdgePackets of A
    p_t: "object"  # EdgePackets of A^T (backward dx)


jax.tree_util.register_dataclass(
    PacketAdj, data_fields=["p", "p_t"], meta_fields=[]
)


Adjacency = Union[
    jax.Array, SparseAdj, BCSRAdj, HaloAdj, HaloBCSRAdj,
    HaloOverlapAdj, HaloBCSROverlapAdj, StackedAdj, PacketAdj,
]


def halo_exchange(x: jax.Array, send_idx: jax.Array, axis) -> jax.Array:
    """Boundary-feature exchange for the halo paths: gather the rows each
    peer needs and ``all_to_all`` them over the mesh.

    ``axis`` may be one mesh axis name (single-host: one flat
    ``all_to_all`` over ICI) or a 2-tuple ``(outer, inner)`` — the
    multi-host ``("dcn", "data")`` mesh — in which case the exchange is
    HIERARCHICAL (VERDICT r4 item 2): an inner-axis ``all_to_all``
    (ICI, within each host) first routes every block to the device with
    its destination's inner rank, then an outer-axis ``all_to_all``
    (DCN, across hosts) delivers it.  Each row crosses each network
    exactly once, and every DCN transfer aggregates the ``n_inner``
    co-hosted sources' blocks into one message — n_inner-fold fewer,
    larger DCN sends than a flat peer-to-peer exchange.  The output
    layout (halo rows ordered by flat source rank) is identical to the
    flat exchange, so plans need no re-indexing.

    Returns ``[n_dev, H, D]`` with row block ``q`` = the ``H`` boundary
    rows received from flat device ``q``.
    """
    send_buf = x[send_idx]  # [n_dev, H, D]
    if isinstance(axis, (tuple, list)):
        outer, inner = axis
        nd = jax.lax.axis_size(outer)
        ni = jax.lax.axis_size(inner)
        n_dev, h, d = send_buf.shape
        sb = send_buf.reshape(nd, ni, h, d)
        # stage 1 (ICI): route by destination INNER rank; afterwards
        # sb[a', c] = my co-host peer c's block for (a', my_inner_rank)
        sb = jax.lax.all_to_all(sb, inner, split_axis=1, concat_axis=1,
                                tiled=True)
        # stage 2 (DCN): route by destination OUTER rank; afterwards
        # sb[e, c] = the block from flat source e*ni + c for me
        sb = jax.lax.all_to_all(sb, outer, split_axis=0, concat_axis=0,
                                tiled=True)
        return sb.reshape(n_dev, h, d)
    return jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=True)


class GraphConv(nn.Module):
    """One graph convolution; returns ``(y, att)`` like the reference layer
    so attention matrices can be logged (reference ``models.py:80``).

    For the dense path ``att`` is the (masked) dense score matrix; for the
    sparse path it is the per-edge score vector.  When ``att=False`` the
    returned attention is just the adjacency (reference behavior: returns
    ``adj`` unchanged)."""

    input_dim: int
    output_dim: int
    add_self: bool = False
    normalize_embedding: bool = False
    dropout: float = 0.0
    use_bias: bool = True
    att: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Adjacency]:
        weight = self.param(
            "weight", xavier_relu_uniform, (self.input_dim, self.output_dim)
        )
        if self.add_self:
            self_weight = self.param(
                "self_weight", xavier_relu_uniform, (self.input_dim, self.output_dim)
            )
        if self.att:
            att_weight = self.param(
                "att_weight", xavier_relu_uniform, (self.input_dim, self.input_dim)
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.output_dim,))

        if self.dropout > 0.001 and not deterministic:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)

        if isinstance(adj, BCSRAdj):
            from tpugraph.ops.pallas_spmm import (
                LANES,
                bcsr_matvec,
                bcsr_matvec_dw,
                bcsr_matvec_dw_pair,
                sddmm_dw,
            )

            d_in = x.shape[-1]
            d_pad = ((d_in + LANES - 1) // LANES) * LANES
            x_p = x
            if d_pad != d_in:
                x_p = jnp.pad(x, ((0, 0), (0, d_pad - d_in)))
            if self.att:
                if adj.tp is None:
                    raise NotImplementedError(
                        "GAT attention on the BCSR path needs a transpose "
                        "plan: BCSRAdj(m, tp=bcsr_transpose_plan(m))"
                    )
                # attention scores restricted to tile support — the
                # block-sparse SDDMM analog of reference models.py:62-68
                x_att = jnp.matmul(x, att_weight,
                                   preferred_element_type=jnp.float32)
                x_att_p = jnp.pad(x_att, ((0, 0), (0, d_pad - d_in)))
                scores = sddmm_dw(adj.m, adj.tp, x_att_p, x_att_p)
                import dataclasses

                eff = dataclasses.replace(
                    adj.m, tiles=adj.m.tiles * scores
                )
                adj_att: Adjacency = BCSRAdj(eff, None, adj.tp)
                y = bcsr_matvec_dw(eff, adj.tp, x_p)[:, :d_in]
            elif adj.tp is not None:
                if adj.m_t is not None:
                    # differentiable path with caller-precomputed W^T —
                    # shared across layers (one transpose per step)
                    y = bcsr_matvec_dw_pair(adj.m, adj.m_t, x_p)[:, :d_in]
                else:
                    y = bcsr_matvec_dw(adj.m, adj.tp, x_p)[:, :d_in]
                adj_att = adj
            else:
                y = bcsr_matvec(
                    adj.m, adj.m_t, x_p, k_pack=adj.k_pack or None
                )[:, :d_in]
                adj_att = adj
        elif isinstance(adj, PacketAdj):
            from tpugraph.ops.pallas_packets import packets_matvec
            from tpugraph.ops.pallas_spmm import LANES

            if self.att:
                raise NotImplementedError(
                    "GAT attention needs per-edge score gradients — use "
                    "BCSRAdj with a transpose plan or SparseAdj"
                )
            ns, d_in = x.shape
            d_pad = ((d_in + LANES - 1) // LANES) * LANES
            x_p = jnp.pad(
                x, ((0, adj.p.num_nodes - ns), (0, d_pad - d_in))
            )
            y = packets_matvec(adj.p, adj.p_t, x_p)[:ns, :d_in]
            adj_att = adj
        elif isinstance(adj, StackedAdj):
            from tpugraph.ops.pallas_resident import stacked_matvec
            from tpugraph.ops.pallas_spmm import LANES

            if self.att:
                raise NotImplementedError(
                    "GAT attention needs tile gradients — use BCSRAdj "
                    "with a transpose plan on the attention path"
                )
            d_in = x.shape[-1]
            d_pad = ((d_in + LANES - 1) // LANES) * LANES
            x_p = x
            if d_pad != d_in:
                x_p = jnp.pad(x, ((0, 0), (0, d_pad - d_in)))
            y = stacked_matvec(adj.st, adj.st_t, x_p,
                               k_pack=adj.k_pack)[:, :d_in]
            adj_att = adj
        elif isinstance(adj, HaloBCSRAdj):
            # Boundary-only halo exchange + per-shard Pallas BCSR SpMM:
            # the multi-chip path at MXU-kernel speed (one all_to_all of
            # boundary features per layer, then a rectangular block-sparse
            # aggregation over [local | halo] columns).
            from tpugraph.ops.pallas_spmm import (
                LANES,
                bcsr_matvec,
                bcsr_matvec_dw,
                sddmm_dw,
            )

            if self.att and adj.tp is None:
                raise NotImplementedError(
                    "GAT on the BCSR-halo path needs a transpose plan: "
                    "HaloBCSRAdj(..., tp=bcsr_transpose_plan(m)) — see "
                    "parallel.spmd.build_halo_bcsr(att=True)"
                )
            ns, d_in = x.shape
            halo = halo_exchange(x, adj.send_idx, adj.axis)
            xx = jnp.concatenate([x, halo.reshape(-1, d_in)], axis=0)
            d_pad = ((d_in + LANES - 1) // LANES) * LANES
            col_pad = adj.m.num_nodes - xx.shape[0]
            xx = jnp.pad(xx, ((0, col_pad), (0, d_pad - d_in)))
            if self.att:
                # attention scores on the [local | halo] tile support —
                # the sharded block-sparse analog of reference
                # models.py:62-68 (VERDICT r3 item 9: GAT at kernel
                # speed on the sharded path)
                xx_att = jnp.matmul(xx[:, :d_in], att_weight,
                                    preferred_element_type=jnp.float32)
                xx_att = jnp.pad(xx_att, ((0, 0), (0, d_pad - d_in)))
                row_pad = adj.m.num_row_nodes - ns
                a_rows = jnp.pad(xx_att[:ns], ((0, row_pad), (0, 0)))
                scores = sddmm_dw(adj.m, adj.tp, a_rows, xx_att)
                import dataclasses

                eff = dataclasses.replace(
                    adj.m, tiles=adj.m.tiles * scores
                )
                y = bcsr_matvec_dw(eff, adj.tp, xx)[:ns, :d_in]
                # null m_t like the BCSRAdj branch: the stale unattended
                # transpose tiles would silently produce wrong backward
                # dx if this adjacency were fed through the non-att
                # bcsr_matvec path (advisor r4) — fail loudly instead
                adj_att: Adjacency = _dataclasses.replace(
                    adj, m=eff, m_t=None
                )
            else:
                y = bcsr_matvec(adj.m, adj.m_t, xx)[:ns, :d_in]
                adj_att = adj
        elif isinstance(adj, HaloBCSROverlapAdj):
            # Overlapped variant: the square local-edge kernel has no
            # data dependence on the all_to_all, so XLA runs the
            # collective concurrently with it; the halo-edge kernel adds
            # its contribution when the exchange lands (SURVEY §7 "halo
            # exchange overlap"; the op being scaled is reference
            # models.py:70).
            from tpugraph.ops.pallas_spmm import (
                LANES,
                bcsr_matvec,
                bcsr_matvec_dw,
                sddmm_dw,
            )

            if self.att and adj.tp_loc is None:
                raise NotImplementedError(
                    "GAT on the overlapped BCSR-halo path needs transpose "
                    "plans — build_halo_bcsr_overlap(att=True)"
                )
            ns, d_in = x.shape
            halo = halo_exchange(x, adj.send_idx, adj.axis).reshape(-1, d_in)
            d_pad = ((d_in + LANES - 1) // LANES) * LANES
            x_p = jnp.pad(
                x, ((0, adj.m_loc.num_nodes - ns), (0, d_pad - d_in))
            )
            h_p = jnp.pad(
                halo,
                ((0, adj.m_halo.num_nodes - halo.shape[0]),
                 (0, d_pad - d_in)),
            )
            if self.att:
                # GAT on the overlapped split: attention scores are two
                # tile-support SDDMMs (one per split BCSR) against the
                # same receiver-side rows — together they cover exactly
                # the [local | halo] support of the unsplit HaloBCSRAdj
                # path (reference attention: models.py:62-68).  The
                # local SDDMM + SpMM still have no data dependence on
                # the all_to_all, so the overlap property is preserved.
                x_att = jnp.matmul(x, att_weight,
                                   preferred_element_type=jnp.float32)
                h_att = jnp.matmul(halo, att_weight,
                                   preferred_element_type=jnp.float32)
                x_att_p = jnp.pad(
                    x_att,
                    ((0, adj.m_loc.num_nodes - ns), (0, d_pad - d_in)),
                )
                h_att_p = jnp.pad(
                    h_att,
                    ((0, adj.m_halo.num_nodes - halo.shape[0]),
                     (0, d_pad - d_in)),
                )
                row_pad = adj.m_loc.num_row_nodes - ns
                a_rows = jnp.pad(x_att_p[:ns], ((0, row_pad), (0, 0)))
                sc_loc = sddmm_dw(adj.m_loc, adj.tp_loc, a_rows, x_att_p)
                sc_halo = sddmm_dw(adj.m_halo, adj.tp_halo, a_rows,
                                   h_att_p)
                import dataclasses

                eff_loc = dataclasses.replace(
                    adj.m_loc, tiles=adj.m_loc.tiles * sc_loc
                )
                eff_halo = dataclasses.replace(
                    adj.m_halo, tiles=adj.m_halo.tiles * sc_halo
                )
                y_loc = bcsr_matvec_dw(eff_loc, adj.tp_loc, x_p)
                y_halo = bcsr_matvec_dw(eff_halo, adj.tp_halo, h_p)
                # stale transposes nulled so misuse fails loudly
                adj_att: Adjacency = _dataclasses.replace(
                    adj, m_loc=eff_loc, m_halo=eff_halo,
                    m_loc_t=None, m_halo_t=None,
                )
            else:
                y_loc = bcsr_matvec(adj.m_loc, adj.m_loc_t, x_p)
                y_halo = bcsr_matvec(adj.m_halo, adj.m_halo_t, h_p)
                adj_att = adj
            y = (y_loc[:ns] + y_halo[:ns])[:, :d_in]
        elif isinstance(adj, HaloOverlapAdj):
            # Overlapped COO halo path: local segment_sum is independent
            # of the all_to_all, so the collective hides behind it.
            halo = halo_exchange(x, adj.send_idx, adj.axis).reshape(
                -1, x.shape[-1])
            if self.att:
                x_att = jnp.matmul(x, att_weight,
                                   preferred_element_type=jnp.float32)
                h_att = jnp.matmul(halo, att_weight,
                                   preferred_element_type=jnp.float32)
                sc_loc = jnp.sum(
                    x_att[adj.s_loc] * x_att[adj.r_loc], axis=-1
                )
                sc_halo = jnp.sum(
                    h_att[adj.h_slot] * x_att[adj.r_halo], axis=-1
                )
                w_loc = adj.w_loc * sc_loc
                w_halo = adj.w_halo * sc_halo
                adj_att = _dataclasses.replace(
                    adj, w_loc=w_loc, w_halo=w_halo
                )
            else:
                w_loc, w_halo = adj.w_loc, adj.w_halo
                adj_att = adj
            y = jax.ops.segment_sum(
                x[adj.s_loc] * w_loc[:, None], adj.r_loc,
                num_segments=x.shape[0],
            )
            y = y + jax.ops.segment_sum(
                halo[adj.h_slot] * w_halo[:, None], adj.r_halo,
                num_segments=x.shape[0],
            )
        elif isinstance(adj, HaloAdj):
            # Boundary-only halo exchange, then local aggregation — one
            # all_to_all over ICI per layer; features stay node-sharded.
            halo = halo_exchange(x, adj.send_idx, adj.axis)
            xx = jnp.concatenate([x, halo.reshape(-1, x.shape[-1])], axis=0)
            if self.att:
                # receiver indices point into the local prefix of xx
                xx_att = jnp.matmul(xx, att_weight,
                                    preferred_element_type=jnp.float32)
                scores = jnp.sum(
                    xx_att[adj.sender_slot] * xx_att[adj.receivers_local],
                    axis=-1,
                )
                eff_weight = adj.weight * scores
                adj_att = _dataclasses.replace(adj, weight=eff_weight)
            else:
                eff_weight = adj.weight
                adj_att = adj
            msgs = xx[adj.sender_slot] * eff_weight[:, None]
            y = jax.ops.segment_sum(
                msgs, adj.receivers_local, num_segments=x.shape[0]
            )
        elif isinstance(adj, SparseAdj):
            if self.att:
                x_att = jnp.matmul(x, att_weight, preferred_element_type=jnp.float32)
                scores = sddmm(adj.senders, adj.receivers, x_att, x_att)
                eff_weight = adj.weight * scores
                adj_att: Adjacency = SparseAdj(adj.senders, adj.receivers, eff_weight)
            else:
                eff_weight = adj.weight
                adj_att = adj
            y = spmm(adj.senders, adj.receivers, eff_weight, x)
        else:
            if self.att:
                x_att = jnp.matmul(x, att_weight, preferred_element_type=jnp.float32)
                adj_att = adj * jnp.matmul(
                    x_att,
                    jnp.swapaxes(x_att, -1, -2),
                    preferred_element_type=jnp.float32,
                )
            else:
                adj_att = adj
            y = dense_spmm(adj_att, x)

        y = jnp.matmul(y, weight, preferred_element_type=jnp.float32)
        if self.add_self:
            y = y + jnp.matmul(x, self_weight, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + bias
        if self.normalize_embedding:
            # F.normalize(y, p=2, dim=-1) — reference models.py:77-78.
            # sumsq + eps keeps the sqrt gradient finite on exactly-zero
            # rows (padded nodes), where torch's y/max(||y||, 1e-12) form
            # would backprop NaN through ||y|| at 0.
            sumsq = jnp.sum(y * y, axis=-1, keepdims=True)
            y = y * jax.lax.rsqrt(sumsq + 1e-24)
        return y, adj_att


def fresh_batch_norm(x: jax.Array, node_axis: int = -2, eps: float = 1e-5) -> jax.Array:
    """Stateless per-node batch normalization.

    The reference constructs a *fresh, untrained* ``nn.BatchNorm1d(N)`` on
    every forward call (reference ``models.py:222-228``) — i.e. affine
    params are always (1, 0) and batch statistics are used.  For an input
    ``[B, N, F]`` BatchNorm1d(N) normalizes each node position over the
    (batch, feature) dims.  This function reproduces exactly that intended
    behavior without the per-call module construction."""
    reduce_axes = tuple(i for i in range(x.ndim) if i != node_axis % x.ndim)
    mean = jnp.mean(x, axis=reduce_axes, keepdims=True)
    var = jnp.var(x, axis=reduce_axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
