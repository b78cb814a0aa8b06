"""Edge-packet sparse format for low-locality (power-law) graphs.

Block-dense BCSR (``tpugraph.ops.bcsr``) is the right TPU format when
tiles are dense (banded / motif / community graphs after ordering), but
on scale-free graphs 256x256 tiles sit at ~0.15% occupancy: 99.85% of
the tile bytes streamed from HBM and of the MXU FLOPs multiply zeros
(BENCH_r02: 2.3e8 edges/s vs 4.5e9 banded).

The edge-packet format keeps the *tile walk* (scalar-prefetched
``row_of``/``col_blk`` driving the BlockSpec index maps, output row
block resident in VMEM across its packets) but replaces the dense tile
values in HBM with the tile's EDGES, grouped into fixed-size packets of
``K`` slots:

  rows    int32[P, K]  — row-local index within the receiver block
  cols    int32[P, K]  — col-local index within the sender block
  w       f32  [P, K]  — edge weight (0 = dead padding slot)
  row_of  int32[P]     — receiver block of the packet
  col_blk int32[P]     — sender block of the packet

The kernel reconstitutes the sparse tile *implicitly* on chip: one-hot
matrices built from ``rows``/``cols`` by VPU iota-compares turn the
gather and scatter into two MXU matmuls per packet
(``g = (w . onehot(cols)) @ x_blk``; ``y += onehot(rows)^T-style @ g``).
HBM traffic per packet is ~1.5 KB of edge data instead of a 131 KB
bf16 tile — on a 0.15%-dense graph that converts the kernel from
HBM-starved to compute-bound.  It also eliminates the host-side tile
materialization entirely (the 2.8 GB / 105 s powerlaw pack of r2).

Tiles with more than ``K`` edges (hub columns) split into several
packets with the same (row_of, col_blk) — the accumulating kernel does
not care.  Tiles with fewer pad with dead slots (w=0, rows/cols=0).

Reference equivalent: none — the reference is dense N^2
(``models.py:70``); this is the TPU-native replacement for the
low-locality regime (SURVEY §2.2 "Intra-op/device kernels").
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EdgePackets:
    """Registered pytree; ``num_nodes``/``block_r``/``block_c``/``k`` are
    static.  Pass as jit ARGUMENTS (not closures) like :class:`BCSR`."""

    rows: jax.Array     # int32[P, K]
    cols: jax.Array     # int32[P, K]
    w: jax.Array        # float[P, K]
    row_of: jax.Array   # int32[P]
    col_blk: jax.Array  # int32[P]
    num_nodes: int      # padded node count (multiple of lcm(block_r, block_c))
    block_r: int        # receiver (output) block height
    block_c: int        # sender (x window) block height

    @property
    def num_packets(self) -> int:
        return self.rows.shape[0]

    @property
    def k(self) -> int:
        return self.rows.shape[1]

    @property
    def num_row_blocks(self) -> int:
        return self.num_nodes // self.block_r

    @property
    def num_edge_slots(self) -> int:
        return self.rows.shape[0] * self.rows.shape[1]


jax.tree_util.register_dataclass(
    EdgePackets,
    data_fields=["rows", "cols", "w", "row_of", "col_blk"],
    meta_fields=["num_nodes", "block_r", "block_c"],
)


def _pad_nodes(num_nodes: int, block_r: int, block_c: int) -> int:
    m = math.lcm(block_r, block_c)
    return ((num_nodes + m - 1) // m) * m


def pack_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block_r: int = 256,
    block_c: int = 256,
    k: int = 128,
    w_dtype=np.float32,
    pk_multiple: int = 8,
) -> EdgePackets:
    """Host-side COO -> EdgePackets conversion (vectorized NumPy, O(E log E)
    for the sort; no tile materialization).  Convention matches
    ``ops.message.spmm``: entry (row=receiver, col=sender) = weight.

    Zero-weight edges are dropped (padding convention of
    ``core.graph``).  Every receiver row block's packet count is padded
    up to a multiple of ``pk_multiple`` (all-dead packets) — the kernel
    processes that many packets per grid step and assumes they share a
    row block; it also guarantees every output block is written.
    Packets are emitted sorted by (row_block, col_block).
    """
    s = np.asarray(senders)
    r = np.asarray(receivers)
    w = np.asarray(weights, dtype=np.float32)
    live = w != 0
    s, r, w = s[live], r[live], w[live]

    n_pad = _pad_nodes(num_nodes, block_r, block_c)
    n_rb = n_pad // block_r
    n_cb = n_pad // block_c

    rb = (r // block_r).astype(np.int64)
    cb = (s // block_c).astype(np.int64)
    key = rb * n_cb + cb
    order = np.argsort(key, kind="stable")
    s, r, w, key = s[order], r[order], w[order], key[order]
    e = len(key)

    uniq, start = np.unique(key, return_index=True)
    counts = np.diff(np.append(start, e))
    # packets per tile, then per row block (plus 1 dead packet for row
    # blocks with no tiles at all)
    pk_per_tile = (counts + k - 1) // k
    tile_rb = (uniq // n_cb).astype(np.int64)
    rb_packets = np.bincount(tile_rb, weights=pk_per_tile, minlength=n_rb)
    rb_packets = rb_packets.astype(np.int64)
    empty_rb = rb_packets == 0
    rb_packets[empty_rb] = 1
    m = max(int(pk_multiple), 1)
    rb_packets = ((rb_packets + m - 1) // m) * m
    p_total = int(rb_packets.sum())

    rows = np.zeros((p_total, k), dtype=np.int32)
    cols = np.zeros((p_total, k), dtype=np.int32)
    wv = np.zeros((p_total, k), dtype=w_dtype)
    row_of = np.repeat(np.arange(n_rb, dtype=np.int32), rb_packets)
    col_blk = np.zeros(p_total, dtype=np.int32)

    # destination packet of each tile's first packet: tiles are sorted by
    # (rb, cb); real tiles of row block b start after the packets of all
    # previous row blocks (incl. injected dead packets of empty blocks).
    rb_packet_start = np.zeros(n_rb + 1, dtype=np.int64)
    rb_packet_start[1:] = np.cumsum(rb_packets)
    # running packet offset of each tile within its row block
    tile_pk_cum = np.zeros(len(uniq), dtype=np.int64)
    if len(uniq):
        cum = np.cumsum(pk_per_tile)
        tile_pk_cum[1:] = cum[:-1]
        # subtract the cumulative packet count at each row block start
        rb_first_tile = np.searchsorted(tile_rb, np.arange(n_rb))
        rb_base = np.zeros(n_rb, dtype=np.int64)
        valid = rb_first_tile < len(uniq)
        rb_base[valid] = tile_pk_cum[rb_first_tile[valid]]
        tile_pk_cum -= rb_base[tile_rb]
    tile_first_packet = rb_packet_start[tile_rb] + tile_pk_cum

    # per-edge destination (packet, slot)
    tile_of_edge = np.repeat(np.arange(len(uniq)), counts)
    slot_in_tile = np.arange(e) - start[tile_of_edge]
    pkt = tile_first_packet[tile_of_edge] + slot_in_tile // k
    slot = slot_in_tile % k

    rows[pkt, slot] = (r % block_r).astype(np.int32)
    cols[pkt, slot] = (s % block_c).astype(np.int32)
    wv[pkt, slot] = w.astype(w_dtype)
    # col_blk for every packet of a tile (incl. trailing padded packet)
    if len(uniq):
        tile_cb = (uniq % n_cb).astype(np.int32)
        total_pk = int(pk_per_tile.sum())
        within = np.arange(total_pk) - np.repeat(
            np.cumsum(pk_per_tile) - pk_per_tile, pk_per_tile
        )
        pkt_ids = np.repeat(tile_first_packet, pk_per_tile) + within
        col_blk[pkt_ids] = np.repeat(tile_cb, pk_per_tile)

    return EdgePackets(
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        w=jnp.asarray(wv),
        row_of=jnp.asarray(row_of),
        col_blk=jnp.asarray(col_blk),
        num_nodes=n_pad,
        block_r=block_r,
        block_c=block_c,
    )


def pack_edges_transpose(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block_r: int = 256,
    block_c: int = 256,
    k: int = 128,
    w_dtype=np.float32,
    pk_multiple: int = 8,
) -> EdgePackets:
    """Packets of A^T (for the backward pass dx = A^T @ g)."""
    return pack_edges(
        receivers, senders, weights, num_nodes, block_r, block_c, k,
        w_dtype=w_dtype, pk_multiple=pk_multiple,
    )


def packet_stats(p: EdgePackets, num_edges: int) -> dict:
    """Occupancy diagnostics for bench reporting."""
    slots = p.num_edge_slots
    return {
        "packets": p.num_packets,
        "k": p.k,
        "slot_occupancy": num_edges / max(slots, 1),
        "edge_bytes": int(
            p.rows.size * 4 + p.cols.size * 4
            + p.w.size * jnp.dtype(p.w.dtype).itemsize
        ),
    }


def packets_to_dense(p: EdgePackets) -> np.ndarray:
    """Densify (testing only)."""
    n = p.num_nodes
    out = np.zeros((n, n), dtype=np.float32)
    rows = np.asarray(p.rows)
    cols = np.asarray(p.cols)
    w = np.asarray(p.w, dtype=np.float32)
    rof = np.asarray(p.row_of)
    cof = np.asarray(p.col_blk)
    for i in range(p.num_packets):
        rr = rof[i] * p.block_r + rows[i]
        cc = cof[i] * p.block_c + cols[i]
        np.add.at(out, (rr, cc), w[i])
    return out
