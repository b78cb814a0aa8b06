"""SPMD message passing and sharded training steps.

Parallelism strategies (SURVEY §2.2 accounting — the reference has NONE
of these):

* **Edge partitioning** (the graph analog of sequence parallelism): the
  padded edge list is sharded over the ``data`` axis; each device runs a
  local ``segment_sum`` over its edge shard against (replicated) node
  features, and one ``psum`` over ICI combines partial aggregates.  One
  collective per GraphConv layer, overlapped by XLA with the following
  matmul.
* **Data parallelism** for graph classification: batch-axis sharding;
  XLA inserts the gradient ``psum`` under ``jit`` automatically.
* **Query parallelism** for the explainer: the vmapped per-node mask
  optimizations are embarrassingly parallel — shard the query axis.

All built on ``shard_map`` / ``NamedSharding`` over a ``Mesh`` — no
hand-written transport (the TPU answer to NCCL/MPI).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpugraph.core.graph import Graph
from tpugraph.nn.layers import SparseAdj
from tpugraph.nn.losses import node_cross_entropy, softmax_cross_entropy


def shard_graph_edges(g: Graph, mesh: Mesh, axis: str = "data") -> Graph:
    """Pad the edge arrays to a multiple of the mesh size and lay them out
    sharded over ``axis``; node arrays are replicated."""
    n_dev = mesh.shape[axis]
    e_pad = g.num_edges_padded
    e_new = ((e_pad + n_dev - 1) // n_dev) * n_dev
    if e_new != e_pad:
        from tpugraph.core.graph import pad_graph

        g = pad_graph(g, g.num_nodes_padded, e_new)
    edge_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return Graph(
        senders=jax.device_put(g.senders, edge_sharding),
        receivers=jax.device_put(g.receivers, edge_sharding),
        edge_weight=jax.device_put(g.edge_weight, edge_sharding),
        node_mask=jax.device_put(g.node_mask, repl),
        n_node=jax.device_put(g.n_node, repl),
        n_edge=jax.device_put(g.n_edge, repl),
        edge_pair=jax.device_put(g.edge_pair, edge_sharding),
    )


def sharded_spmm(
    mesh: Mesh, axis="data"
) -> Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]:
    """Edge-partitioned sparse aggregation: local segment_sum + psum.

    Returns ``f(senders, receivers, weights, x) -> y`` where the edge
    arrays are sharded over ``axis`` and ``x``/``y`` are replicated.
    ``axis`` may be a tuple of mesh axes (e.g. ``("dcn", "data")`` on a
    2-D multi-host mesh) — the edge dimension shards over their product
    and the psum reduces over both (gradient-style traffic on DCN, the
    heavy all-reduce partials on ICI).
    """

    def local_agg(s, r, w, x):
        msgs = x[s] * w[:, None]
        part = jax.ops.segment_sum(msgs, r, num_segments=x.shape[0])
        return jax.lax.psum(part, axis)

    return shard_map(
        local_agg,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )


def partition_edges_by_receiver(
    g: Graph, n_dev: int
) -> Tuple[Graph, int]:
    """Host-side edge partitioning by receiver shard for node-partitioned
    SPMD: nodes are split into ``n_dev`` contiguous shards; each shard
    owns the edges that TARGET its nodes (receivers remapped to local
    indices).  Every shard is padded to the max shard edge count so the
    result is one flat, evenly-shardable edge list.

    Returns ``(graph, shard_size)`` where the graph's receiver array holds
    LOCAL indices and nodes are padded to a multiple of ``n_dev``.
    """
    n_pad = ((g.num_nodes_padded + n_dev - 1) // n_dev) * n_dev
    ns = n_pad // n_dev
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(g.edge_weight)
    p = np.asarray(g.edge_pair)
    live = w != 0
    shard_of = r // ns
    e_max = 0
    per_shard = []
    for d in range(n_dev):
        idx = np.nonzero(live & (shard_of == d))[0]
        per_shard.append(idx)
        e_max = max(e_max, len(idx))
    e_max = max(((e_max + 7) // 8) * 8, 8)

    S = np.zeros((n_dev, e_max), np.int32)
    R = np.zeros((n_dev, e_max), np.int32)
    W = np.zeros((n_dev, e_max), np.float32)
    Pr = np.full((n_dev, e_max), n_dev * e_max, np.int32)
    for d, idx in enumerate(per_shard):
        k = len(idx)
        S[d, :k] = s[idx]
        R[d, :k] = r[idx] - d * ns  # local receiver index
        W[d, :k] = w[idx]
        Pr[d, :k] = p[idx]
    node_mask = np.zeros((n_pad,), np.float32)
    node_mask[: int(g.n_node)] = 1.0
    out = Graph(
        senders=jnp.asarray(S.reshape(-1)),
        receivers=jnp.asarray(R.reshape(-1)),
        edge_weight=jnp.asarray(W.reshape(-1)),
        node_mask=jnp.asarray(node_mask),
        n_node=g.n_node,
        n_edge=g.n_edge,
        edge_pair=jnp.asarray(Pr.reshape(-1)),
    )
    return out, ns


def sharded_spmm_node_partitioned(
    mesh: Mesh, axis: str = "data"
) -> Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]:
    """Node-partitioned sparse aggregation: node features AND outputs live
    sharded across the mesh (memory scales 1/n_dev); each device
    all-gathers sender features over ICI (the halo, currently the full
    feature matrix — boundary-only exchange is the planned refinement)
    and segment-sums its receiver-local edge shard.

    ``f(senders, receivers_local, weights, x_sharded) -> y_sharded``
    with edge arrays from :func:`partition_edges_by_receiver`.
    """

    def local_agg(s, r_loc, w, x_local):
        xg = jax.lax.all_gather(x_local, axis, tiled=True)  # [N, D]
        msgs = xg[s] * w[:, None]
        return jax.ops.segment_sum(msgs, r_loc, num_segments=x_local.shape[0])

    return shard_map(
        local_agg,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )


class HaloPlan(NamedTuple):
    """Host-precomputed boundary-exchange plan for node-partitioned SpMM.

    ``send_idx[d, e, H]``: local node indices device ``d`` sends to peer
    ``e`` (its boundary nodes that e's edges reference); padded with 0.
    ``sender_slot[d, E_max]``: per-edge gather index into the concat of
    [local shard (Ns) | received halo (n_dev*H)].
    ``receivers_local``, ``weights``: receiver-sharded edge arrays as in
    :func:`partition_edges_by_receiver`.
    """

    send_idx: jax.Array        # int32[n_dev, n_dev, H]
    sender_slot: jax.Array     # int32[n_dev, E_max]
    receivers_local: jax.Array # int32[n_dev, E_max]
    weights: jax.Array         # float32[n_dev, E_max]
    shard_size: int            # Ns  [static via closure]
    halo_size: int             # H


def balance_partition(
    receivers: np.ndarray, num_nodes: int, n_dev: int,
    weights: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Degree-balancing node relabeling for contiguous node partitioning.

    The halo plan shards nodes into contiguous ranges; on skewed (power-
    law) graphs the hub-heavy range then owns several times the mean
    edge count and — because the plan pads every device to the max —
    every device pays for it (measured r3: max/mean 4.7 at 8 shards,
    weak-scaling efficiency 0.24).  Dealing nodes to shards in a
    descending-degree snake equalizes per-shard in-degree mass, so
    contiguous ranges of the RELABELED ids are balanced.

    Returns ``(perm, inv)`` with ``perm[new_id] = old_id``; relabel
    edges as ``inv[senders]``/``inv[receivers]`` and node payloads as
    ``payload[perm]`` before :func:`build_halo_plan`.
    """
    r = np.asarray(receivers)
    if weights is not None:
        live = np.asarray(weights) != 0
        r = r[live]
    deg = np.bincount(r, minlength=num_nodes)
    n_pad = ((num_nodes + n_dev - 1) // n_dev) * n_dev
    if n_pad > num_nodes:
        deg = np.pad(deg, (0, n_pad - num_nodes))
    order = np.argsort(-deg, kind="stable")  # descending degree
    ns = n_pad // n_dev
    # snake dealing: round j goes 0..n_dev-1 then n_dev-1..0
    shard_seq = np.tile(
        np.concatenate([np.arange(n_dev), np.arange(n_dev)[::-1]]),
        (ns + 1) // 2 + 1,
    )[:n_pad]
    slot_seq = np.repeat(np.arange((n_pad + 2 * n_dev - 1) // (2 * n_dev) * 2),
                         n_dev)[:n_pad]
    new_ids = shard_seq * ns + slot_seq
    perm = np.empty(n_pad, dtype=np.int64)
    perm[new_ids] = order
    inv = np.empty(n_pad, dtype=np.int64)
    inv[perm] = np.arange(n_pad)
    return perm, inv


def locality_partition(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    n_dev: int,
    weights: Optional[np.ndarray] = None,
    iters: int = 20,
    slack: float = 1.02,
) -> Tuple[np.ndarray, np.ndarray]:
    """Locality-aware node relabeling for contiguous partitioning:
    degree-snake seed (balanced) refined by balanced label propagation
    (``native.label_prop_partition`` — greedy min-cut under node-count
    and in-edge-mass caps).  Where :func:`balance_partition` deliberately
    scatters node ids (maximal locality destruction), this pulls
    neighbor clusters onto the same shard, cutting the halo rows each
    device must receive — on community-structured graphs by an order of
    magnitude; on locality-free random graphs (Chung-Lu) it measurably
    cannot (see ``bench_partition_ceiling.py``), which is the evidence
    that the residual halo volume there is topology, not partitioning.

    Returns ``(perm, inv)`` with ``perm[new_id] = old_id``, both of
    length ``n_pad = ns * n_dev`` where ``ns`` is the (8-aligned) max
    partition size — may exceed ``ceil(N / n_dev) * n_dev`` by the
    ``slack``.  Relabel edges as ``inv[senders]``/``inv[receivers]`` and
    node payloads as ``payload_padded[perm]`` before
    :func:`build_halo_plan`.  Reference analog: none (dense
    single-device, reference ``train.py:180-186``).
    """
    from tpugraph import native

    s = np.asarray(senders)
    r = np.asarray(receivers)
    w = (np.asarray(weights, np.float32) if weights is not None
         else np.ones(len(s), np.float32))

    # balanced seed: degree-snake shard assignment
    perm0, inv0 = balance_partition(r, num_nodes, n_dev, weights=w)
    ns0 = len(perm0) // n_dev
    seed_assign = (inv0[:num_nodes] // ns0).astype(np.int32)

    assign, _ = native.label_prop_partition(
        s, r, w, num_nodes, n_dev, seed_assign, iters=iters, slack=slack
    )

    sizes = np.bincount(assign, minlength=n_dev)
    ns = max(int(sizes.max()), (num_nodes + n_dev - 1) // n_dev)
    ns = ((ns + 7) // 8) * 8
    n_pad = ns * n_dev
    perm = np.empty(n_pad, np.int64)
    next_pad = num_nodes  # virtual (edge-free) old ids fill shard tails
    for d in range(n_dev):
        ids = np.flatnonzero(assign == d)
        perm[d * ns : d * ns + len(ids)] = ids
        n_fill = ns - len(ids)
        perm[d * ns + len(ids) : (d + 1) * ns] = np.arange(
            next_pad, next_pad + n_fill
        )
        next_pad += n_fill
    inv = np.empty(n_pad, np.int64)
    inv[perm] = np.arange(n_pad)
    return perm, inv


def build_halo_plan(g: Graph, n_dev: int) -> HaloPlan:
    """Precompute the boundary exchange: which of my nodes each peer
    needs, and how each of my edges finds its sender (locally or in the
    received halo buffer).  One-time host cost, O(E) — native C++
    (``graph_engine.cpp:halo_plan_*``) with a Python fallback."""
    n_pad = ((g.num_nodes_padded + n_dev - 1) // n_dev) * n_dev
    ns = n_pad // n_dev
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(g.edge_weight)

    try:
        from tpugraph import native

        out = native.halo_plan(s, r, w, ns, n_dev)
    except Exception:
        out = None
    if out is not None:
        send_idx, sender_slot, receivers_local, weights, e_max, h = out
        return HaloPlan(
            send_idx=jnp.asarray(send_idx),
            sender_slot=jnp.asarray(sender_slot),
            receivers_local=jnp.asarray(receivers_local),
            weights=jnp.asarray(weights),
            shard_size=ns,
            halo_size=h,
        )

    live = w != 0

    # edges grouped by receiver shard
    shard_edges = [np.nonzero(live & (r // ns == d))[0] for d in range(n_dev)]
    e_max = max((len(ix) for ix in shard_edges), default=1)
    e_max = max(((e_max + 7) // 8) * 8, 8)

    # needed[d][e] = sorted remote nodes (owned by e) that d's edges read
    needed = [[[] for _ in range(n_dev)] for _ in range(n_dev)]
    for d in range(n_dev):
        senders_d = s[shard_edges[d]]
        remote = senders_d[senders_d // ns != d]
        for node in np.unique(remote):
            needed[d][int(node // ns)].append(int(node))
    h = max(
        (len(lst) for row in needed for lst in row), default=1
    )
    h = max(((h + 7) // 8) * 8, 8)

    send_idx = np.zeros((n_dev, n_dev, h), np.int32)
    # recv slot lookup: for device d, node -> position in its halo buffer
    recv_slot = [dict() for _ in range(n_dev)]
    for d in range(n_dev):
        for e in range(n_dev):
            for j, node in enumerate(needed[d][e]):
                send_idx[e, d, j] = node - e * ns     # local index at sender e
                recv_slot[d][node] = e * h + j        # position in d's halo

    sender_slot = np.zeros((n_dev, e_max), np.int32)
    receivers_local = np.zeros((n_dev, e_max), np.int32)
    weights = np.zeros((n_dev, e_max), np.float32)
    for d in range(n_dev):
        ix = shard_edges[d]
        for k, e_id in enumerate(ix):
            snd = int(s[e_id])
            if snd // ns == d:
                sender_slot[d, k] = snd - d * ns
            else:
                sender_slot[d, k] = ns + recv_slot[d][snd]
            receivers_local[d, k] = r[e_id] - d * ns
            weights[d, k] = w[e_id]

    return HaloPlan(
        send_idx=jnp.asarray(send_idx),
        sender_slot=jnp.asarray(sender_slot),
        receivers_local=jnp.asarray(receivers_local),
        weights=jnp.asarray(weights),
        shard_size=ns,
        halo_size=h,
    )


class HaloBCSRPlan(NamedTuple):
    """Host-precomputed halo plan whose per-device edge shards are packed
    as rectangular BCSRs over ``[local | halo]`` columns (stacked over a
    leading device axis), composing the Pallas SpMM with the multi-chip
    halo path.  ``m``/``m_t`` are :class:`tpugraph.ops.bcsr.BCSR` pytrees
    whose array leaves carry a leading ``[n_dev]`` axis."""

    send_idx: jax.Array  # int32[n_dev, n_dev, H]
    m: object            # stacked BCSR  (rows=[Ns_pad], cols=[Ns+halo pad])
    m_t: object          # stacked BCSR of the transpose
    shard_size: int
    halo_size: int
    tp: object = None    # stacked BCSRTranspose plan of m (GAT models)


def _pad_tp(tp, t_pad: int):
    """Append dead entries (perm 0, keep 0, last row block) so a
    :class:`BCSRTranspose` plan has ``t_pad`` tiles — equalizes counts
    across stacked per-device plans."""
    import dataclasses

    t = tp.num_tiles
    if t_pad < t:
        raise ValueError(f"tile budget too small: {t} > {t_pad}")
    if t_pad == t:
        return tp
    extra = t_pad - t
    row_ptr = np.asarray(tp.row_ptr).copy()
    n_rb = row_ptr.shape[0] - 1
    row_ptr[n_rb] += extra
    return dataclasses.replace(
        tp,
        col_blk=jnp.asarray(np.concatenate(
            [np.asarray(tp.col_blk), np.zeros(extra, np.int32)])),
        row_ptr=jnp.asarray(row_ptr),
        row_of=jnp.asarray(np.concatenate(
            [np.asarray(tp.row_of), np.full(extra, n_rb - 1, np.int32)])),
        perm=jnp.asarray(np.concatenate(
            [np.asarray(tp.perm), np.zeros(extra, np.int32)])),
        keep=jnp.asarray(np.concatenate(
            [np.asarray(tp.keep), np.zeros(extra, np.float32)])),
    )


def build_halo_bcsr(plan: HaloPlan, n_dev: int, block: int = 128,
                    tile_dtype=None, att: bool = False) -> HaloBCSRPlan:
    """Pack each device's receiver-local edges (from
    :func:`build_halo_plan`) into a rectangular BCSR over
    ``[local | halo]`` columns, plus its transpose for the backward pass.
    All devices pad to the max tile count so the stacked arrays are
    rectangular and shard cleanly over the mesh axis.

    ``att=True`` additionally builds (and stacks) each device's
    :class:`BCSRTranspose` plan so GAT attention runs at kernel speed on
    the sharded path (tile-support SDDMM; VERDICT r3 item 9)."""
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_pad_tiles

    ns, h = plan.shard_size, plan.halo_size
    n_col = ns + n_dev * h
    ss = np.asarray(plan.sender_slot)
    rr = np.asarray(plan.receivers_local)
    ww = np.asarray(plan.weights)

    ms, mts = [], []
    for d in range(n_dev):
        ms.append(bcsr_from_coo(
            ss[d], rr[d], ww[d], ns, block=block, num_col_nodes=n_col,
            tile_dtype=tile_dtype,
        ))
        mts.append(bcsr_from_coo(
            rr[d], ss[d], ww[d], n_col, block=block, num_col_nodes=ns,
            tile_dtype=tile_dtype,
        ))
    t_max = max(m.num_tiles for m in ms)
    tt_max = max(m.num_tiles for m in mts)
    ms = [bcsr_pad_tiles(m, t_max) for m in ms]
    mts = [bcsr_pad_tiles(m, tt_max) for m in mts]

    stack = _stack_bcsrs
    tp_stacked = _stack_tps(ms) if att else None

    return HaloBCSRPlan(
        send_idx=plan.send_idx,
        m=stack(ms),
        m_t=stack(mts),
        shard_size=ns,
        halo_size=h,
        tp=tp_stacked,
    )


class HaloOverlapPlan(NamedTuple):
    """Host-precomputed SPLIT halo plan (VERDICT r3 item 2): each
    device's live edges are separated into the local-local set (both
    endpoints in the shard) and the halo-dependent set, so the local
    aggregation can overlap the boundary ``all_to_all``.  Arrays carry a
    leading ``[n_dev]`` axis and shard over the mesh axis."""

    send_idx: jax.Array  # int32[n_dev, n_dev, H]
    s_loc: jax.Array     # int32[n_dev, EL] — local sender index
    r_loc: jax.Array     # int32[n_dev, EL]
    w_loc: jax.Array     # float32[n_dev, EL] (0 on padding)
    h_slot: jax.Array    # int32[n_dev, EH] — halo-buffer slot of sender
    r_halo: jax.Array    # int32[n_dev, EH]
    w_halo: jax.Array    # float32[n_dev, EH]
    shard_size: int
    halo_size: int


def split_halo_plan(plan: HaloPlan, n_dev: int) -> HaloOverlapPlan:
    """Split a :class:`HaloPlan`'s per-device edges into local-local and
    halo-dependent sets (host-side, O(E) boolean masks).  All devices pad
    both sets to the max count so the stacked arrays stay rectangular."""
    ns = plan.shard_size
    ss = np.asarray(plan.sender_slot)
    rr = np.asarray(plan.receivers_local)
    ww = np.asarray(plan.weights)
    n_dev_, _ = ss.shape
    assert n_dev_ == n_dev, (n_dev_, n_dev)
    live = ww != 0
    loc = live & (ss < ns)
    rem = live & (ss >= ns)
    el = max(int(loc.sum(axis=1).max(initial=0)), 1)
    eh = max(int(rem.sum(axis=1).max(initial=0)), 1)
    el = max(((el + 7) // 8) * 8, 8)
    eh = max(((eh + 7) // 8) * 8, 8)

    S_loc = np.zeros((n_dev, el), np.int32)
    R_loc = np.zeros((n_dev, el), np.int32)
    W_loc = np.zeros((n_dev, el), np.float32)
    H_slot = np.zeros((n_dev, eh), np.int32)
    R_halo = np.zeros((n_dev, eh), np.int32)
    W_halo = np.zeros((n_dev, eh), np.float32)
    for d in range(n_dev):
        li = np.flatnonzero(loc[d])
        S_loc[d, : len(li)] = ss[d, li]
        R_loc[d, : len(li)] = rr[d, li]
        W_loc[d, : len(li)] = ww[d, li]
        ri = np.flatnonzero(rem[d])
        H_slot[d, : len(ri)] = ss[d, ri] - ns
        R_halo[d, : len(ri)] = rr[d, ri]
        W_halo[d, : len(ri)] = ww[d, ri]
    return HaloOverlapPlan(
        send_idx=plan.send_idx,
        s_loc=jnp.asarray(S_loc),
        r_loc=jnp.asarray(R_loc),
        w_loc=jnp.asarray(W_loc),
        h_slot=jnp.asarray(H_slot),
        r_halo=jnp.asarray(R_halo),
        w_halo=jnp.asarray(W_halo),
        shard_size=ns,
        halo_size=plan.halo_size,
    )


class HaloBCSROverlapPlan(NamedTuple):
    """Split halo plan whose per-device edge sets are packed as BCSRs:
    ``m_loc`` square over local columns (overlaps the collective),
    ``m_halo`` rectangular over the halo buffer (applied after).  BCSR
    leaves carry a leading ``[n_dev]`` axis."""

    send_idx: jax.Array
    m_loc: object
    m_loc_t: object
    m_halo: object
    m_halo_t: object
    shard_size: int
    halo_size: int
    tp_loc: object = None   # stacked BCSRTranspose of m_loc (GAT)
    tp_halo: object = None  # stacked BCSRTranspose of m_halo (GAT)


def _stack_bcsrs(lst):
    import dataclasses

    from tpugraph.ops.bcsr import bcsr_pad_tiles

    t_max = max(m.num_tiles for m in lst)
    lst = [bcsr_pad_tiles(m, t_max) for m in lst]
    return dataclasses.replace(
        lst[0],
        tiles=jnp.stack([m.tiles for m in lst]),
        col_blk=jnp.stack([m.col_blk for m in lst]),
        row_ptr=jnp.stack([m.row_ptr for m in lst]),
        row_of=jnp.stack([m.row_of for m in lst]),
    )


def _stack_tps(ms):
    """Build each per-device BCSR's :class:`BCSRTranspose` plan, pad to
    the max tile count, and stack over a leading device axis (GAT
    tile-support SDDMM on the sharded paths)."""
    import dataclasses

    from tpugraph.ops.bcsr import bcsr_transpose_plan

    tps = [bcsr_transpose_plan(m) for m in ms]
    tp_max = max(t.num_tiles for t in tps)
    tps = [_pad_tp(t, tp_max) for t in tps]
    return dataclasses.replace(
        tps[0],
        col_blk=jnp.stack([t.col_blk for t in tps]),
        row_ptr=jnp.stack([t.row_ptr for t in tps]),
        row_of=jnp.stack([t.row_of for t in tps]),
        perm=jnp.stack([t.perm for t in tps]),
        keep=jnp.stack([t.keep for t in tps]),
    )


def build_halo_bcsr_overlap(
    plan: HaloPlan, n_dev: int, block: int = 128, tile_dtype=None,
    att: bool = False,
) -> HaloBCSROverlapPlan:
    """Pack each device's SPLIT edge sets (:func:`split_halo_plan`) into
    a square local BCSR + a rectangular halo BCSR (plus transposes), so
    the local Pallas SpMM overlaps the boundary exchange.

    ``att=True`` additionally stacks each split's :class:`BCSRTranspose`
    plan so GAT attention runs at kernel speed on the overlapped path
    (tile-support SDDMM per split; VERDICT r4 item 7)."""
    from tpugraph.ops.bcsr import bcsr_from_coo

    sp = split_halo_plan(plan, n_dev)
    ns, h = plan.shard_size, plan.halo_size
    n_halo_col = n_dev * h
    sl = np.asarray(sp.s_loc)
    rl = np.asarray(sp.r_loc)
    wl = np.asarray(sp.w_loc)
    hs = np.asarray(sp.h_slot)
    rh = np.asarray(sp.r_halo)
    wh = np.asarray(sp.w_halo)

    ml, mlt, mh, mht = [], [], [], []
    for d in range(n_dev):
        ml.append(bcsr_from_coo(sl[d], rl[d], wl[d], ns, block=block,
                                tile_dtype=tile_dtype))
        mlt.append(bcsr_from_coo(rl[d], sl[d], wl[d], ns, block=block,
                                 tile_dtype=tile_dtype))
        mh.append(bcsr_from_coo(hs[d], rh[d], wh[d], ns, block=block,
                                num_col_nodes=n_halo_col,
                                tile_dtype=tile_dtype))
        mht.append(bcsr_from_coo(rh[d], hs[d], wh[d], n_halo_col,
                                 block=block, num_col_nodes=ns,
                                 tile_dtype=tile_dtype))
    if att:
        # transpose plans index into the STACKED (tile-padded) BCSRs, so
        # pad each list to its max tile count before planning
        from tpugraph.ops.bcsr import bcsr_pad_tiles

        ml = [bcsr_pad_tiles(m, max(x.num_tiles for x in ml)) for m in ml]
        mh = [bcsr_pad_tiles(m, max(x.num_tiles for x in mh)) for m in mh]
    return HaloBCSROverlapPlan(
        send_idx=plan.send_idx,
        m_loc=_stack_bcsrs(ml),
        m_loc_t=_stack_bcsrs(mlt),
        m_halo=_stack_bcsrs(mh),
        m_halo_t=_stack_bcsrs(mht),
        shard_size=ns,
        halo_size=h,
        tp_loc=_stack_tps(ml) if att else None,
        tp_halo=_stack_tps(mh) if att else None,
    )


def _bcsr_slice0(m):
    """Strip the leading length-1 device axis shard_map leaves on each
    array of a stacked BCSR."""
    import dataclasses

    return dataclasses.replace(
        m, tiles=m.tiles[0], col_blk=m.col_blk[0], row_ptr=m.row_ptr[0],
        row_of=m.row_of[0],
    )


def _tp_slice0(tp):
    """Strip the leading length-1 device axis on a stacked
    :class:`BCSRTranspose` plan."""
    import dataclasses

    return dataclasses.replace(
        tp, col_blk=tp.col_blk[0], row_ptr=tp.row_ptr[0],
        row_of=tp.row_of[0], perm=tp.perm[0], keep=tp.keep[0],
    )


def _make_halo_step_generic(model, tx, mesh, axis, class_weight,
                            adj_builder):
    """Shared node-partitioned train-step skeleton: per-device plan
    arrays arrive as ONE pytree arg sharded over ``axis`` (prefix spec),
    ``adj_builder`` turns the sliced arrays into the layer's adjacency."""

    def local_step(params, opt_state, plan_arrays, x, y, mask):
        adj = adj_builder(plan_arrays)

        def loss_fn(p):
            logits, _ = model.apply(p, x, adj)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
            wts = class_weight[y] if class_weight is not None \
                else jnp.ones_like(nll)
            wts = wts * mask
            num = jax.lax.psum(jnp.sum(nll * wts), axis)
            den = jax.lax.psum(jnp.sum(wts), axis)
            return num / jnp.maximum(den, 1e-12)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def _make_halo_fwd_generic(model, mesh, axis, adj_builder):
    def local_fwd(params, plan_arrays, x):
        adj = adj_builder(plan_arrays)
        logits, _ = model.apply(params, x, adj)
        return logits

    return shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )


def make_halo_overlap_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Node-partitioned training on the OVERLAPPED halo path
    (:class:`tpugraph.nn.layers.HaloOverlapAdj`): the local-local
    ``segment_sum`` runs concurrently with the boundary ``all_to_all``
    (no data dependence), hiding the exchange behind local aggregation
    (VERDICT r3 item 2; BASELINE.json north star).  Same contract as
    :func:`make_halo_node_train_step`; pass a :class:`HaloOverlapPlan`.
    """

    def build(arrs):
        from tpugraph.nn.layers import HaloOverlapAdj

        si, sl, rl, wl, hs, rh, wh = arrs
        return HaloOverlapAdj(si[0], sl[0], rl[0], wl[0],
                              hs[0], rh[0], wh[0], axis)

    sharded = _make_halo_step_generic(model, tx, mesh, axis, class_weight,
                                      build)

    def step(params, opt_state, plan: HaloOverlapPlan, x, y, train_mask):
        arrs = (plan.send_idx, plan.s_loc, plan.r_loc, plan.w_loc,
                plan.h_slot, plan.r_halo, plan.w_halo)
        return sharded(params, opt_state, arrs, x, y, train_mask)

    return jax.jit(step)


def make_halo_overlap_forward(model, mesh: Mesh, axis: str = "data"):
    """Node-sharded forward on the overlapped halo path."""

    def build(arrs):
        from tpugraph.nn.layers import HaloOverlapAdj

        si, sl, rl, wl, hs, rh, wh = arrs
        return HaloOverlapAdj(si[0], sl[0], rl[0], wl[0],
                              hs[0], rh[0], wh[0], axis)

    sharded = _make_halo_fwd_generic(model, mesh, axis, build)

    def fwd(params, plan: HaloOverlapPlan, x):
        arrs = (plan.send_idx, plan.s_loc, plan.r_loc, plan.w_loc,
                plan.h_slot, plan.r_halo, plan.w_halo)
        return sharded(params, arrs, x)

    return jax.jit(fwd)


def make_halo_bcsr_overlap_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Node-partitioned training where the SQUARE local-edge Pallas BCSR
    kernel overlaps the boundary ``all_to_all`` and the small rectangular
    halo BCSR adds the boundary contribution after — multi-chip training
    at kernel speed WITH exchange/compute overlap (VERDICT r3 item 2).
    Pass a :class:`HaloBCSROverlapPlan`."""

    sharded = _make_halo_step_generic(model, tx, mesh, axis, class_weight,
                                      partial(_overlap_adj_from_arrs,
                                              axis=axis))

    def step(params, opt_state, plan: HaloBCSROverlapPlan, x, y,
             train_mask):
        return sharded(params, opt_state, _overlap_plan_arrs(plan), x, y,
                       train_mask)

    return jax.jit(step)


def _overlap_plan_arrs(plan: HaloBCSROverlapPlan):
    arrs = (plan.send_idx, plan.m_loc, plan.m_loc_t, plan.m_halo,
            plan.m_halo_t)
    if plan.tp_loc is not None:
        arrs = arrs + (plan.tp_loc, plan.tp_halo)
    return arrs


def _overlap_adj_from_arrs(arrs, axis: str):
    from tpugraph.nn.layers import HaloBCSROverlapAdj

    si, ml, mlt, mh, mht = arrs[:5]
    tpl = _tp_slice0(arrs[5]) if len(arrs) > 5 else None
    tph = _tp_slice0(arrs[6]) if len(arrs) > 6 else None
    return HaloBCSROverlapAdj(
        si[0], _bcsr_slice0(ml), _bcsr_slice0(mlt),
        _bcsr_slice0(mh), _bcsr_slice0(mht),
        tp_loc=tpl, tp_halo=tph, axis=axis,
    )


def make_halo_bcsr_overlap_forward(model, mesh: Mesh, axis: str = "data"):
    """Node-sharded forward on the overlapped BCSR-halo path."""

    sharded = _make_halo_fwd_generic(model, mesh, axis,
                                     partial(_overlap_adj_from_arrs,
                                             axis=axis))

    def fwd(params, plan: HaloBCSROverlapPlan, x):
        return sharded(params, _overlap_plan_arrs(plan), x)

    return jax.jit(fwd)


def make_halo_bcsr_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Node-partitioned full-batch training where each layer's halo
    aggregation runs on the per-shard Pallas BCSR kernel
    (:class:`tpugraph.nn.layers.HaloBCSRAdj`) instead of COO
    ``segment_sum`` — the multi-chip story at kernel speed (VERDICT r2
    item 3).  Same contract as :func:`make_halo_node_train_step`; pass a
    :class:`HaloBCSRPlan`.  A plan built with ``att=True`` carries the
    stacked transpose plan, enabling GAT models at kernel speed on this
    path (VERDICT r3 item 9)."""

    def build(arrs):
        from tpugraph.nn.layers import HaloBCSRAdj

        si, m, m_t = arrs[:3]
        tp = _tp_slice0(arrs[3]) if len(arrs) > 3 else None
        return HaloBCSRAdj(si[0], _bcsr_slice0(m), _bcsr_slice0(m_t),
                           tp, axis)

    sharded = _make_halo_step_generic(model, tx, mesh, axis, class_weight,
                                      build)

    def step(params, opt_state, plan: HaloBCSRPlan, x, y, train_mask):
        arrs = (plan.send_idx, plan.m, plan.m_t)
        if plan.tp is not None:
            arrs = arrs + (plan.tp,)
        return sharded(params, opt_state, arrs, x, y, train_mask)

    return jax.jit(step)


def make_halo_bcsr_forward(model, mesh: Mesh, axis: str = "data"):
    """Node-sharded forward on the BCSR-halo path (companion to
    :func:`make_halo_bcsr_train_step`)."""

    def build(arrs):
        from tpugraph.nn.layers import HaloBCSRAdj

        si, m, m_t = arrs[:3]
        tp = _tp_slice0(arrs[3]) if len(arrs) > 3 else None
        return HaloBCSRAdj(si[0], _bcsr_slice0(m), _bcsr_slice0(m_t),
                           tp, axis)

    sharded = _make_halo_fwd_generic(model, mesh, axis, build)

    def fwd(params, plan: HaloBCSRPlan, x):
        arrs = (plan.send_idx, plan.m, plan.m_t)
        if plan.tp is not None:
            arrs = arrs + (plan.tp,)
        return sharded(params, arrs, x)

    return jax.jit(fwd)


def sharded_spmm_halo(mesh: Mesh, axis="data") -> Callable:
    """Node-partitioned SpMM with boundary-only halo exchange.

    Each device sends exactly the boundary node features its peers need
    (``all_to_all`` over ICI, volume O(boundary) instead of O(N)), then
    aggregates its receiver-local edges from [local | halo] features.
    ``axis`` may be a 2-tuple (e.g. ``("dcn", "data")``) for the
    hierarchical multi-host exchange (``nn.layers.halo_exchange``).

    ``f(plan_arrays..., x_sharded) -> y_sharded`` — call via
    :func:`apply_halo_spmm` which unpacks a :class:`HaloPlan`.
    """
    from tpugraph.nn.layers import halo_exchange

    def local_agg(send_idx, sender_slot, r_loc, w, x_local):
        # send_idx: [1, n_dev, H] (this device's row), x_local: [Ns, D]
        halo = halo_exchange(x_local, send_idx[0], axis)   # [n_dev, H, D]
        halo = halo.reshape(-1, x_local.shape[-1])         # [n_dev*H, D]
        xx = jnp.concatenate([x_local, halo], axis=0)
        msgs = xx[sender_slot[0]] * w[0][:, None]
        return jax.ops.segment_sum(
            msgs, r_loc[0], num_segments=x_local.shape[0]
        )

    return shard_map(
        local_agg,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )


def apply_halo_spmm(mesh: Mesh, plan: HaloPlan, x: jax.Array,
                    axis: str = "data") -> jax.Array:
    """Run the halo-exchange SpMM given a plan and node-sharded features
    ``x [n_dev*Ns, D]``."""
    f = sharded_spmm_halo(mesh, axis)
    return f(plan.send_idx, plan.sender_slot, plan.receivers_local,
             plan.weights, x)


def _halo_adj_from_slices(send_idx, sender_slot, r_loc, w, axis: str):
    """Build the per-device :class:`HaloAdj` from shard_map-sliced plan
    arrays (each carries a leading length-1 device axis)."""
    from tpugraph.nn.layers import HaloAdj

    return HaloAdj(send_idx[0], sender_slot[0], r_loc[0], w[0], axis)


def make_halo_node_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Node-partitioned full-batch training with per-layer boundary-only
    halo exchange — the multi-chip path for graphs too large to replicate
    (VERDICT r1 item 4; SURVEY §2.2 "long-context analog", finished).

    Features, labels, and masks stay node-sharded over ``axis`` for ALL
    ``num_layers`` GraphConv layers; each layer's :class:`HaloAdj` branch
    does one ``all_to_all`` of boundary features over ICI.  Gradients for
    the replicated parameters are combined with an explicit ``psum``
    (pmap-style shard_map step).

    Returns ``step(params, opt_state, plan, x, y, train_mask) ->
    (params, opt_state, loss)`` where ``x [n_dev*Ns, D]``, ``y``/``mask``
    ``[n_dev*Ns]`` are node-sharded and ``plan`` is a :class:`HaloPlan`.
    """

    def local_step(params, opt_state, send_idx, sender_slot, r_loc, w,
                   x, y, m):
        adj = _halo_adj_from_slices(send_idx, sender_slot, r_loc, w, axis)

        def loss_fn(p):
            logits, _ = model.apply(p, x, adj)
            # weighted CE with GLOBAL normalization: local sums + psum
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
            wts = class_weight[y] if class_weight is not None else jnp.ones_like(nll)
            wts = wts * m
            num = jax.lax.psum(jnp.sum(nll * wts), axis)
            den = jax.lax.psum(jnp.sum(wts), axis)
            return num / jnp.maximum(den, 1e-12)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P()) + (P(axis),) * 7,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, plan: HaloPlan, x, y, train_mask):
        return sharded(
            params, opt_state, plan.send_idx, plan.sender_slot,
            plan.receivers_local, plan.weights, x, y, train_mask,
        )

    return jax.jit(step)


def make_halo_node_forward(model, mesh: Mesh, axis: str = "data"):
    """Node-sharded forward returning FULL logits ``[n_dev*Ns, C]``
    (node-sharded output spec; evaluation/prediction companion to
    :func:`make_halo_node_train_step`)."""

    def local_fwd(params, send_idx, sender_slot, r_loc, w, x):
        adj = _halo_adj_from_slices(send_idx, sender_slot, r_loc, w, axis)
        logits, _ = model.apply(params, x, adj)
        return logits

    sharded = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 5,
        out_specs=P(axis),
        check_vma=False,
    )

    def fwd(params, plan: HaloPlan, x):
        return sharded(params, plan.send_idx, plan.sender_slot,
                       plan.receivers_local, plan.weights, x)

    return jax.jit(fwd)


def resolve_halo_overlap(overlap: str, mesh: Mesh) -> bool:
    """Overlap policy for the halo paths (VERDICT r4 item 4).

    ``"on"``/``"off"`` force; ``"auto"`` = overlap only on REAL
    multi-device hardware.  Rationale (measured, halo_scaling_r4.json):
    the split step's benefit is latency hiding — the boundary
    ``all_to_all`` has no data dependence on the local aggregation, so on
    real chips it rides ICI while the MXU works.  On a single device
    there is nothing to hide, and on the virtual CPU proxy the
    time-shared devices serialize everything, so the split's extra
    bookkeeping costs ~14% wall-clock with zero benefit — plain wins
    there (0.99 vs 0.95 banded efficiency).
    """
    if overlap == "on":
        return True
    if overlap == "off":
        return False
    if overlap != "auto":
        raise ValueError(f"overlap must be 'auto'/'on'/'off', got {overlap!r}")
    devs = mesh.devices.ravel()
    return len(devs) > 1 and devs[0].platform != "cpu"


def build_halo(
    g: Graph,
    mesh: Mesh,
    *,
    bcsr: bool = True,
    block: int = 128,
    overlap: str = "auto",
    att: bool = False,
    tile_dtype=None,
    axis: str = "data",
):
    """One-stop halo plan builder: :func:`build_halo_plan` plus the
    variant the overlap policy picks (plain vs split, COO vs BCSR).  The
    returned plan's TYPE routes :func:`make_halo_train_step` /
    :func:`make_halo_forward` to the matching kernel, so callers no
    longer choose between four ``make_halo_*`` factories blind
    (VERDICT r4 item 4).
    """
    n_dev = int(np.prod([mesh.shape[a] for a in
                         ((axis,) if isinstance(axis, str) else axis)]))
    plan = build_halo_plan(g, n_dev)
    ov = resolve_halo_overlap(overlap, mesh)
    if bcsr:
        if ov:
            return build_halo_bcsr_overlap(plan, n_dev, block=block,
                                           tile_dtype=tile_dtype, att=att)
        return build_halo_bcsr(plan, n_dev, block=block,
                               tile_dtype=tile_dtype, att=att)
    return split_halo_plan(plan, n_dev) if ov else plan


def make_halo_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    plan,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Single entry point for node-partitioned halo training: dispatches
    on the plan type produced by :func:`build_halo` (or any of the
    explicit builders).  Returns ``step(params, opt_state, plan, x, y,
    train_mask) -> (params, opt_state, loss)``."""
    if isinstance(plan, HaloBCSROverlapPlan):
        return make_halo_bcsr_overlap_train_step(model, tx, mesh, axis,
                                                 class_weight)
    if isinstance(plan, HaloBCSRPlan):
        return make_halo_bcsr_train_step(model, tx, mesh, axis,
                                         class_weight)
    if isinstance(plan, HaloOverlapPlan):
        return make_halo_overlap_train_step(model, tx, mesh, axis,
                                            class_weight)
    if isinstance(plan, HaloPlan):
        return make_halo_node_train_step(model, tx, mesh, axis,
                                         class_weight)
    raise TypeError(f"not a halo plan: {type(plan).__name__}")


def make_halo_forward(model, mesh: Mesh, plan, axis: str = "data"):
    """Single entry point for the node-sharded halo forward (companion
    to :func:`make_halo_train_step`)."""
    if isinstance(plan, HaloBCSROverlapPlan):
        return make_halo_bcsr_overlap_forward(model, mesh, axis)
    if isinstance(plan, HaloBCSRPlan):
        return make_halo_bcsr_forward(model, mesh, axis)
    if isinstance(plan, HaloOverlapPlan):
        return make_halo_overlap_forward(model, mesh, axis)
    if isinstance(plan, HaloPlan):
        return make_halo_node_forward(model, mesh, axis)
    raise TypeError(f"not a halo plan: {type(plan).__name__}")


def make_sharded_node_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    class_weight: Optional[jax.Array] = None,
):
    """Full-batch node-classification train step with the SpMM inside the
    model running edge-partitioned over the mesh.

    The model's sparse path calls ``jax.ops.segment_sum`` on gathered
    features; under ``jit`` with edge arrays sharded over ``axis`` and
    parameters/features replicated, XLA partitions the gather/scatter by
    edges and inserts the ``psum`` — the same computation
    ``sharded_spmm`` spells out manually with shard_map.

    Returns ``step(params, opt_state, g, x, y, train_mask)``, jitted with
    explicit shardings.
    """
    edge_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, g: Graph, x, y, train_mask):
        sp = SparseAdj(g.senders, g.receivers, g.edge_weight)

        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(
                logits, y, class_weight=class_weight, node_mask=train_mask
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    graph_shardings = Graph(
        senders=edge_sh, receivers=edge_sh, edge_weight=edge_sh,
        node_mask=repl, n_node=repl, n_edge=repl, edge_pair=edge_sh,
    )
    return jax.jit(
        step,
        in_shardings=(repl, repl, graph_shardings, repl, repl, repl),
        out_shardings=(repl, repl, repl),
    )


def make_dp_graph_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    linkpred: bool = False,
    uses_assign: bool = False,
    has_dropout: bool = False,
):
    """Data-parallel graph-classification train step: the batch axis of
    every tensor is sharded over ``axis``; parameters/optimizer state are
    replicated and XLA inserts the gradient ``psum`` under ``jit``.

    Drop-in for the single-device step of
    ``train/loop.py:train_graph_classifier`` (same signature and
    semantics, incl. dropout rng, DiffPool assign features, and the
    linkpred auxiliary loss), so DP training produces the identical loss
    trajectory.  ``batch_size`` must divide by the mesh size.
    """
    batch_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, key, adj, x, node_mask, assign, label):
        def loss_fn(p):
            kwargs = {"node_mask": node_mask}
            if uses_assign:
                kwargs["assign_x"] = assign
            if key is not None:
                kwargs["deterministic"] = False
                if has_dropout:
                    kwargs["rngs"] = {"dropout": key}
            logits, aux = model.apply(p, x, adj, **kwargs)
            loss = softmax_cross_entropy(logits, label)
            if linkpred and isinstance(aux, (list, tuple)) and aux:
                from tpugraph.nn.losses import link_prediction_loss

                loss = loss + link_prediction_loss(aux[0], adj, node_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl) + (batch_sh,) * 5,
        out_shardings=(repl, repl, repl, batch_sh),
    )
