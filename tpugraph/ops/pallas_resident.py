"""VMEM-resident SpMM: the low-locality (power-law) fast path.

The streaming BCSR kernels (``pallas_spmm.py``) DMA one ``[B, D]``
x-block from HBM per tile.  On a locality-rich (banded) graph consecutive
tiles share columns and the pipeline amortizes; on a scale-free graph the
column sequence is effectively random, so the gather stream is as large
as the tile stream itself (1.35 GB of x vs 1.35 GB of int8 tiles per
SpMM at 65k nodes / 2.1M edges / D=128) and the kernel pins at the HBM
roofline (r2/r3 bench: 4.11e8 edges/s).

This kernel removes that stream entirely: the activations ``x`` AND the
output accumulator live in VMEM for the whole grid (v5e VMEM is large
enough for 65k x 128: x bf16 = 16.8 MB, out f32 = 33.5 MB), tiles are
the only HBM traffic, streamed ``k_pack`` per grid step through the
normal BlockSpec pipeline.  Because the output is fully resident there
is **no row-ordering requirement at all** — no row_ptr, no CSR walk, no
per-row zeroing: step 0 zeroes the accumulator and every tile
read-modify-writes its row slice.

``stack`` lets tiles that share a COLUMN block (same x-slice) stack
vertically into one ``[stack*B, B] @ [B, D]`` matmul.  MEASURED (r3):
stacking is NEUTRAL here — per-tile ``[256,256]@[256,128]`` dots already
sustain 78% of nominal MXU peak when operands feed from VMEM, so the
"M<=256 fills 2 of 4 output tiles" model from the packet-kernel
diagnosis does not bind; ``stack=1`` (which also needs no host re-sort)
is the shipped bench configuration.  ``stack=2`` is kept for training.

Replaces the same op as ``pallas_spmm.spmm_bcsr`` (reference
``models.py:70`` computes it densely); auto-selection between the two
lives in the callers (bench / train fast path).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugraph.ops.bcsr import BCSR

LANES = 128

# Budget passed to Mosaic; the resident buffers must fit under it
# together with the streamed tile window.  v5e has 128 MiB of VMEM.
_VMEM_LIMIT = 110 * 2**20


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@dataclasses.dataclass
class BCSRStacked:
    """Column-stacked BCSR: ``tiles[i]`` holds ``stack`` vertically
    stacked ``[B, B]`` tiles that all read column block ``col_blk[i]``
    and scatter to row blocks ``rows[i, 0..stack-1]``.  Tiles whose
    column group had no partner are padded with zero tile-halves whose
    row pointer repeats a real one (adds zero — harmless).

    Pytree: arrays are data, ``num_nodes`` / ``num_row_nodes`` /
    ``block`` / ``stack`` static."""

    tiles: jax.Array     # [T, stack*B, B]  (bf16 / int8 / f32), or
                         # [T, stack*B, B//2] int8 when packed4
    col_blk: jax.Array   # int32[T]
    rows: jax.Array      # int32[T*stack] — lane-major flat (2-D scalar
                         # prefetch arrays >= ~16 KB fail to compile on
                         # this platform's Mosaic; 1-D works to 100 KB+)
    num_nodes: int       # padded COLUMN count (rows of x)
    num_row_nodes: int   # padded ROW count (rows of y)
    block: int
    stack: int
    packed4: bool = False  # int4 nibble packing: byte (r, c) holds
                           # col c (lo nibble) and col c+B//2 (hi) —
                           # halves being contiguous means expansion is
                           # two shift/and slabs + a lane concat, no
                           # cross-lane interleave.  Exact for integer
                           # weights in [0, 15] (unit adjacencies).

    @property
    def num_tiles(self) -> int:
        return self.tiles.shape[0]


jax.tree_util.register_dataclass(
    BCSRStacked,
    data_fields=["tiles", "col_blk", "rows"],
    meta_fields=["num_nodes", "num_row_nodes", "block", "stack", "packed4"],
)


def pack_stacked_int4(st: BCSRStacked) -> BCSRStacked:
    """Nibble-pack a stacked layout whose tile values are integers in
    [0, 15] (host-side).  Halves the tile HBM stream again vs int8 — on
    the power-law bench that stream is what keeps the resident kernel off
    the MXU roofline."""
    tiles = np.asarray(st.tiles)
    if tiles.dtype != np.int8:
        tiles = np.rint(np.asarray(tiles, np.float32)).astype(np.int8)
    # stay in uint8 end-to-end: an int32 intermediate at 20k+ tiles was
    # measured at ~220 s of host time; this path is ~3 s
    u = tiles.view(np.uint8)
    if bool((u > 15).any()):  # negatives view as >127
        raise ValueError("int4 packing needs integer weights in [0, 15]")
    h = st.block // 2
    packed = (u[:, :, :h] | (u[:, :, h:] << 4)).view(np.int8)
    return dataclasses.replace(
        st, tiles=jnp.asarray(packed), packed4=True
    )


def stack_bcsr(m: BCSR, stack: int = 2, k_pack: int = 4) -> BCSRStacked:
    """Host-side regrouping of a BCSR into the column-stacked layout.

    Sorts tiles by (column block, row block), groups runs of equal
    column into ``stack``-high stacks (padding odd remainders with zero
    halves), and pads the stack count to a multiple of ``k_pack`` with
    dead stacks.  Dead padding tiles already present in ``m`` (all-zero
    values from ``pad_rows_to``) are dropped first."""
    tiles = np.asarray(m.tiles)
    row = np.asarray(m.row_of)
    col = np.asarray(m.col_blk)
    b = m.block

    if stack == 1:
        # No pairing, and the resident kernel has NO ordering requirement
        # (the output accumulator is whole-array resident): reuse the
        # packer's layout as-is, just pad the tile count to k_pack.  Skips
        # the lexsort + 1.4 GB scatter copy (~60-110 s host time at 21k
        # 256^2 tiles — the s1 path is the bench default, keep it cheap).
        # Dead padding tiles (all-zero, from pad_rows_to / empty-row
        # coverage) are still dropped (advisor r3) — but scanning ALL
        # tiles costs 9.2 s host time at 21k 256^2 tiles (measured r4).
        # Every packer-injected dead tile points at column block 0
        # (bcsr_from_coo / _pad_rows_layout / bcsr_pad_tiles convention),
        # so only those candidates need the np.any check.
        cand = np.flatnonzero(col == 0)
        keep = None
        if cand.size:
            cand_live = np.any(tiles[cand] != 0, axis=(1, 2))
            if not cand_live.all():
                live_mask = np.ones(tiles.shape[0], bool)
                live_mask[cand[~cand_live]] = False
                keep = np.flatnonzero(live_mask)
        t = tiles.shape[0] if keep is None else len(keep)
        t2p = ((t + k_pack - 1) // k_pack) * k_pack
        if keep is not None or t2p != t:
            # ONE gather into the preallocated padded buffer (a separate
            # tiles[keep] + concatenate pair costs two full 1.35 GB
            # copies at bench scale)
            new_tiles = np.zeros((t2p,) + tiles.shape[1:], tiles.dtype)
            if keep is None:
                new_tiles[:t] = tiles
            else:
                np.take(tiles, keep, axis=0, out=new_tiles[:t])
                col = col[keep]
                row = row[keep]
            tiles = new_tiles
            col = np.concatenate([col, np.zeros(t2p - t, np.int32)])
            row = np.concatenate([row, np.zeros(t2p - t, np.int32)])
        return BCSRStacked(
            tiles=jnp.asarray(tiles),
            col_blk=jnp.asarray(col.astype(np.int32)),
            rows=jnp.asarray(row.astype(np.int32)),
            num_nodes=m.num_nodes,
            num_row_nodes=m.num_row_nodes,
            block=b,
            stack=1,
        )

    live = np.flatnonzero(np.any(tiles != 0, axis=(1, 2)))
    tiles, row, col = tiles[live], row[live], col[live]
    order = np.lexsort((row, col))
    tiles, row, col = tiles[order], row[order], col[order]
    t = len(row)

    if t == 0:
        t2p = k_pack
        st_tiles = np.zeros((t2p, stack * b, b), dtype=tiles.dtype)
        return BCSRStacked(
            tiles=jnp.asarray(st_tiles),
            col_blk=jnp.zeros((t2p,), jnp.int32),
            rows=jnp.zeros((t2p * stack,), jnp.int32),
            num_nodes=m.num_nodes,
            num_row_nodes=m.num_row_nodes,
            block=b,
            stack=stack,
        )

    grp_start = np.r_[0, np.flatnonzero(np.diff(col)) + 1]
    sizes = np.diff(np.r_[grp_start, t])
    pos = np.arange(t) - np.repeat(grp_start, sizes)
    n_stacks = (sizes + stack - 1) // stack
    stack_base = np.r_[0, np.cumsum(n_stacks)]
    dst = np.repeat(stack_base[:-1], sizes) + pos // stack
    lane = pos % stack
    t2 = int(n_stacks.sum())
    t2p = ((t2 + k_pack - 1) // k_pack) * k_pack

    st_tiles = np.zeros((t2p, stack, b, b), dtype=tiles.dtype)
    st_tiles[dst, lane] = tiles
    del tiles
    st_tiles = st_tiles.reshape(t2p, stack * b, b)

    col2 = np.zeros((t2p,), np.int32)
    col2[dst] = col
    # every lane needs a VALID row pointer; unfilled lanes repeat lane 0
    # of their stack (their tile half is zero, so they add nothing)
    rows2 = np.zeros((t2p, stack), np.int32)
    first = lane == 0
    rows2[dst[first], 0] = row[first]
    for s in range(1, stack):
        rows2[:, s] = rows2[:, 0]
        sel = lane == s
        rows2[dst[sel], s] = row[sel]
    return BCSRStacked(
        tiles=jnp.asarray(st_tiles),
        col_blk=jnp.asarray(col2),
        rows=jnp.asarray(rows2.reshape(-1)),
        num_nodes=m.num_nodes,
        num_row_nodes=m.num_row_nodes,
        block=b,
        stack=stack,
    )


def _resident_kernel_factory(k_pack: int, block: int, stack: int,
                             packed4: bool = False, cast_out: bool = False):
    def kernel(rows_ref, col_ref, tiles_ref, x_ref, out_ref, *scratch):
        # cast_out: accumulate in a persistent f32 VMEM scratch and write
        # the (narrower) out operand ONCE in the last step — halves the
        # final HBM writeback.  MEASURED r4 (bench_resident_diag3): +14%
        # on the banded chain (0.874 -> 0.765 ms/iter); unlike the
        # STREAMING kernel's per-row-block downcast (40% slower, r3),
        # the resident accumulator pays the cast exactly once.
        acc_ref = scratch[0] if cast_out else out_ref
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * k_pack
        for j in range(k_pack):
            tile = tiles_ref[j]  # [stack*B, B] (or [stack*B, B//2] int4)
            if packed4:
                v = tile.astype(jnp.int32) & 0xFF
                tile = jnp.concatenate(
                    [(v & 0xF).astype(jnp.bfloat16),
                     ((v >> 4) & 0xF).astype(jnp.bfloat16)],
                    axis=1,
                )
            elif tile.dtype == jnp.int8:
                tile = tile.astype(jnp.bfloat16)
            xv = x_ref[pl.ds(col_ref[base + j] * block, block), :]
            if xv.dtype != tile.dtype:
                xv = xv.astype(tile.dtype)
            acc = jnp.dot(tile, xv, preferred_element_type=jnp.float32)
            for s in range(stack):
                r0 = rows_ref[(base + j) * stack + s] * block
                acc_ref[pl.ds(r0, block), :] += acc[s * block:(s + 1) * block]

        if cast_out:
            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


def spmm_stacked_resident(
    m: BCSRStacked,
    x: jax.Array,
    k_pack: int = 4,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """``y = A @ x`` with A column-stacked and x/out VMEM-resident.

    ``x`` is ``[num_nodes, D]`` (bf16 recommended — resident copy is
    half the size and feeds the MXU directly); output is
    ``[num_row_nodes, D]`` at ``out_dtype`` (default f32).
    ``out_dtype=bfloat16`` accumulates in a persistent f32 VMEM scratch
    and downcasts once in the final grid step — measured +14% on the
    banded chain (bench_resident_diag3, r4); accumulation precision is
    identical.  Requires the resident buffers to fit
    under the ~110 MB VMEM budget; callers fall back to the streaming
    kernels above that size (see :func:`resident_fits`)."""
    n, d = x.shape
    assert n == m.num_nodes, (n, m.num_nodes)
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    b = m.block
    t = m.num_tiles
    stack = m.stack
    n_out = m.num_row_nodes
    assert t % k_pack == 0, f"pad stacks to a multiple of {k_pack}"
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = jnp.float32
    out_dtype = jnp.dtype(out_dtype)
    cast_out = out_dtype != jnp.float32
    win = tile_window_bytes_for(
        k_pack, stack, b, jnp.dtype(m.tiles.dtype).itemsize, m.packed4
    )
    # cast_out keeps BOTH the f32 scratch accumulator and the narrow out
    # operand resident
    out_budget = n_out * d * (4 + out_dtype.itemsize) if cast_out \
        else n_out * d * 4
    assert resident_fits(n, 0, d, x.dtype.itemsize,
                         tile_window_bytes=win + out_budget), (
        f"resident buffers exceed VMEM budget: x[{n},{d}] + out[{n_out},{d}]"
        f" + {win >> 20} MB tile window"
    )

    tile_cols = b // 2 if m.packed4 else b
    scratch = [pltpu.VMEM((n_out, d), jnp.float32)] if cast_out else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // k_pack,),
        in_specs=[
            pl.BlockSpec((k_pack, stack * b, tile_cols),
                         lambda i, rows, col: (i, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=scratch,
    )
    tile_b = jnp.dtype(m.tiles.dtype).itemsize
    return pl.pallas_call(
        _resident_kernel_factory(k_pack, b, stack, m.packed4, cast_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * stack * b * b * d,
            bytes_accessed=t * stack * b * tile_cols * tile_b
            + n * d * x.dtype.itemsize + n_out * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(m.rows, m.col_blk, m.tiles, x)


class BCSRPair:
    """Host-concatenated pair layout for :func:`spmm_pair_resident`:
    A's and A_t's stack=1 tile streams back-to-back in ONE array, so the
    fused kernel streams a single BlockSpec operand (no inactive-stream
    fetches, and the tile window affords k_pack=128).  Build with
    :func:`pack_pair`; for a symmetric adjacency pass the same stacked
    BCSR twice (the concat is the one-time memory cost).

    Pytree: arrays data; counts static."""

    def __init__(self, tiles, col_blk, rows, t1, num_nodes,
                 num_mid_nodes, num_out_nodes, block):
        self.tiles = tiles
        self.col_blk = col_blk
        self.rows = rows
        self.t1 = t1
        self.num_nodes = num_nodes
        self.num_mid_nodes = num_mid_nodes
        self.num_out_nodes = num_out_nodes
        self.block = block

    def tree_flatten(self):
        return ((self.tiles, self.col_blk, self.rows),
                (self.t1, self.num_nodes, self.num_mid_nodes,
                 self.num_out_nodes, self.block))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_tiles(self):
        return self.tiles.shape[0]


jax.tree_util.register_pytree_node(
    BCSRPair, BCSRPair.tree_flatten, BCSRPair.tree_unflatten
)


def pack_pair(st: BCSRStacked, st_t: BCSRStacked) -> BCSRPair:
    """Concatenate two stack=1 BCSRStacked operands (A then A_t) into
    the single-stream :class:`BCSRPair` layout (one-time host/device
    copy — 2 x the tile bytes)."""
    assert st.stack == 1 and st_t.stack == 1
    assert not st.packed4 and not st_t.packed4
    assert st.block == st_t.block
    assert st_t.num_nodes == st.num_row_nodes, "A_t columns must be A rows"
    return BCSRPair(
        tiles=jnp.concatenate([st.tiles, st_t.tiles]),
        col_blk=jnp.concatenate([st.col_blk, st_t.col_blk]),
        rows=jnp.concatenate([st.rows, st_t.rows]),
        t1=st.num_tiles,
        num_nodes=st.num_nodes,
        num_mid_nodes=st.num_row_nodes,
        num_out_nodes=st_t.num_row_nodes,
        block=st.block,
    )


def _pair_kernel_factory(k_pack: int, block: int, g1: int,
                         n_mid: int, n_out: int):
    """Fused ``A_t @ (A @ x)`` kernel over ONE concatenated tile stream:
    phase 1 (grid steps < g1) accumulates y in a resident f32 scratch;
    the phase boundary downcasts y ONCE to a resident bf16 scratch and
    re-zeroes the SAME f32 scratch, which phase 2 reuses as its
    accumulator; the final step writes the narrow output operand once.
    Reusing the accumulator keeps the resident budget at x + acc_f32 +
    y_bf16 + out_bf16 (~84 MB at bench size) so a single stream affords
    k_pack=128.  Measured on the way here (r5): k_pack=16 was
    0.74 ms/iter SLOWER than the 2-call chain (per-grid-step cost ~0.3
    us binds below ~64 tiles/step) and a TWO-stream kp=64 variant tied
    it.  The concatenated rows/col prefetch tables index uniformly as
    ``i * k_pack + j``."""

    def kernel(rows_ref, col_ref, tiles_ref, x_ref, out_ref,
               acc_ref, ybf_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i == g1)
        def _():
            # one whole-array downcast at the phase boundary (the r4
            # lesson: a single resident downcast is cheap, per-tile
            # casts put the VPU on the critical path), then reuse the
            # f32 scratch as phase 2's accumulator
            ybf_ref[:] = acc_ref[0:n_mid, :].astype(jnp.bfloat16)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def dots(src_ref):
            base = i * k_pack
            for j in range(k_pack):
                tile = tiles_ref[j]
                if tile.dtype == jnp.int8:
                    tile = tile.astype(jnp.bfloat16)
                v = src_ref[pl.ds(col_ref[base + j] * block, block), :]
                if v.dtype != tile.dtype:
                    v = v.astype(tile.dtype)
                acc = jnp.dot(tile, v,
                              preferred_element_type=jnp.float32)
                r0 = rows_ref[base + j] * block
                acc_ref[pl.ds(r0, block), :] += acc

        @pl.when(i < g1)
        def _():
            dots(x_ref)

        @pl.when(i >= g1)
        def _():
            dots(ybf_ref)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[0:n_out, :].astype(out_ref.dtype)

    return kernel


def spmm_pair_resident(
    pair: BCSRPair,
    x: jax.Array,
    k_pack: int = 128,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """``dx = A_t @ (A @ x)`` in ONE ``pallas_call`` (VERDICT r4 item 3).

    The per-call decomposition (``bench_palcall_diag.py``, r5) showed the
    resident chain's above-MXU-floor cost is ~104 us of multi-step-GRID
    machinery per call (a trivial kernel costs 0.3 us at grid=1 but
    ~110 us at grid>=2) plus ~1.2 us/MB of resident-buffer traffic —
    with 2 calls/iter that is the entire ~0.4 ms gap to the dense-FLOP
    floor.  Fusing the fwd+bwd pair halves the call count and keeps the
    intermediate ``y`` in VMEM between phases (no writeback + reload).

    This is the propagation primitive ``A_t(A x)`` (power iteration /
    diffusion / the bench's chained fwd+bwd); it is NOT usable inside
    training's fwd/bwd, which are separated by the loss.  Build ``pair``
    with :func:`pack_pair`; x is ``[num_nodes, D]`` (bf16 recommended),
    output ``[num_out_nodes, D]`` at ``out_dtype``.  Not differentiable
    (static weights by construction)."""
    n, d = x.shape
    assert n == pair.num_nodes, (n, pair.num_nodes)
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    b = pair.block
    t1 = pair.t1
    t2 = pair.num_tiles - t1
    assert t1 % k_pack == 0 and t2 % k_pack == 0, (t1, t2, k_pack)
    g1 = t1 // k_pack
    g2 = t2 // k_pack
    n_mid = pair.num_mid_nodes
    n_out = pair.num_out_nodes
    if interpret is None:
        interpret = not _on_tpu()

    out_dtype = jnp.dtype(out_dtype)
    n_acc = max(n_mid, n_out)
    win = tile_window_bytes_for(
        k_pack, 1, b, jnp.dtype(pair.tiles.dtype).itemsize
    )
    # resident: x + shared acc f32 + y_bf16 + out
    extra = (n_acc * d * 4 + n_mid * d * 2
             + n_out * d * out_dtype.itemsize)
    assert resident_fits(n, 0, d, x.dtype.itemsize,
                         tile_window_bytes=win + extra), (
        f"pair-resident buffers exceed VMEM: x[{n},{d}] + acc[{n_acc},"
        f"{d}] f32 + y_bf16[{n_mid},{d}] + out[{n_out},{d}]"
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g1 + g2,),
        in_specs=[
            pl.BlockSpec((k_pack, b, b),
                         lambda i, rows, col: (i, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_acc, d), jnp.float32),
            pltpu.VMEM((n_mid, d), jnp.bfloat16),
        ],
    )
    tile_b = jnp.dtype(pair.tiles.dtype).itemsize
    return pl.pallas_call(
        _pair_kernel_factory(k_pack, b, g1, n_mid, n_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (t1 + t2) * b * b * d,
            bytes_accessed=(t1 + t2) * b * b * tile_b
            + n * d * x.dtype.itemsize + n_out * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(pair.rows, pair.col_blk, pair.tiles, x)


def _power_kernel_factory(k_pack: int, block: int, g1: int, g2: int,
                          n_mid: int, n_out: int, hops: int,
                          hop_scale: float = 1.0):
    """``(A_t A)^hops x`` in one grid: ``hops`` repetitions of the pair
    schedule (phase 1 = A's tiles, phase 2 = A_t's), with ONE bf16
    scratch serving alternately as the hop input and the mid buffer —
    at each hop/phase boundary the f32 accumulator is downcast into it
    and re-zeroed.  The tile stream simply repeats every
    ``g1 + g2`` steps (index map modulo)."""
    steps_per_hop = g1 + g2

    def kernel(rows_ref, col_ref, tiles_ref, x_ref, out_ref,
               acc_ref, ybf_ref):
        i = pl.program_id(0)
        h = i // steps_per_hop
        j = i % steps_per_hop

        @pl.when(j == 0)
        def _():
            @pl.when(h > 0)
            def _():
                # previous hop's result (scaled) becomes this hop's input
                ybf_ref[0:n_out, :] = (
                    acc_ref[0:n_out, :] * hop_scale
                ).astype(jnp.bfloat16)

            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(j == g1)
        def _():
            # phase boundary: mid result y replaces the hop input (phase
            # 1 is done reading it)
            ybf_ref[0:n_mid, :] = acc_ref[0:n_mid, :].astype(jnp.bfloat16)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def dots(src_ref):
            base = j * k_pack
            for jj in range(k_pack):
                tile = tiles_ref[jj]
                if tile.dtype == jnp.int8:
                    tile = tile.astype(jnp.bfloat16)
                v = src_ref[pl.ds(col_ref[base + jj] * block, block), :]
                if v.dtype != tile.dtype:
                    v = v.astype(tile.dtype)
                acc = jnp.dot(tile, v,
                              preferred_element_type=jnp.float32)
                r0 = rows_ref[base + jj] * block
                acc_ref[pl.ds(r0, block), :] += acc

        @pl.when((h == 0) & (j < g1))
        def _():
            dots(x_ref)

        @pl.when(jnp.logical_not((h == 0) & (j < g1)))
        def _():
            dots(ybf_ref)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = (acc_ref[0:n_out, :] * hop_scale).astype(
                out_ref.dtype)

    return kernel


def spmm_power_resident(
    pair: BCSRPair,
    x: jax.Array,
    hops: int,
    k_pack: int = 128,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    hop_scale: float = 1.0,
) -> jax.Array:
    """``(hop_scale * A_t A)^hops @ x`` in ONE ``pallas_call`` — the
    SGC/APPNP-style
    diffusion propagation primitive (no nonlinearity between hops), with
    the ~200 us/call grid + resident constant amortized over ``hops``
    fused fwd+bwd pairs.  For a symmetric adjacency
    (``pack_pair(st, st)``) this is ``A^(2*hops) x``.

    Intermediate hops round to bf16 (one downcast per phase, the r4
    lesson); requires ``pair.num_out_nodes == pair.num_nodes`` so hops
    compose.  ``hop_scale`` (static) rescales each hop's result at the
    boundary downcast — pass ``1/spectral_radius(A_t A)``-ish (e.g.
    ``1/deg**2`` for a unit-weight regular graph) to keep an
    UN-normalized operator's powers inside bf16 range; a sym-normalized
    adjacency needs no scale.  Like :func:`spmm_pair_resident` this is a STATIC-weights
    propagation op (not differentiable, not usable inside
    loss-separated training).
    """
    n, d = x.shape
    assert hops >= 1
    assert n == pair.num_nodes, (n, pair.num_nodes)
    assert pair.num_out_nodes == n, "power iteration needs square pair"
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    b = pair.block
    t1 = pair.t1
    t2 = pair.num_tiles - t1
    assert t1 % k_pack == 0 and t2 % k_pack == 0, (t1, t2, k_pack)
    g1, g2 = t1 // k_pack, t2 // k_pack
    n_mid = pair.num_mid_nodes
    n_out = pair.num_out_nodes
    if interpret is None:
        interpret = not _on_tpu()

    out_dtype = jnp.dtype(out_dtype)
    n_acc = max(n_mid, n_out)
    n_ybf = max(n_mid, n)
    win = tile_window_bytes_for(
        k_pack, 1, b, jnp.dtype(pair.tiles.dtype).itemsize
    )
    extra = (n_acc * d * 4 + n_ybf * d * 2
             + n_out * d * out_dtype.itemsize)
    assert resident_fits(n, 0, d, x.dtype.itemsize,
                         tile_window_bytes=win + extra), (
        f"power-resident buffers exceed VMEM: x[{n},{d}] + acc[{n_acc},"
        f"{d}] f32 + ybf[{n_ybf},{d}] + out[{n_out},{d}]"
    )

    steps = g1 + g2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hops * steps,),
        in_specs=[
            pl.BlockSpec((k_pack, b, b),
                         lambda i, rows, col: (i % steps, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_acc, d), jnp.float32),
            pltpu.VMEM((n_ybf, d), jnp.bfloat16),
        ],
    )
    tile_b = jnp.dtype(pair.tiles.dtype).itemsize
    return pl.pallas_call(
        _power_kernel_factory(k_pack, b, g1, g2, n_mid, n_out, hops,
                              hop_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=hops * 2 * (t1 + t2) * b * b * d,
            bytes_accessed=hops * (t1 + t2) * b * b * tile_b
            + n * d * x.dtype.itemsize + n_out * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(pair.rows, pair.col_blk, pair.tiles, x)


def resident_fits(n: int, n_out: int, d: int, x_itemsize: int = 2,
                  slack_bytes: int = 8 * 2**20,
                  tile_window_bytes: int = 0) -> bool:
    """Whether the resident x + out accumulator fit the VMEM budget.

    ``tile_window_bytes`` is the streamed (double-buffered) tile window —
    ``2 * k_pack * stack * block * tile_cols * itemsize`` — which also
    lives in VMEM (advisor r3: ~33 MB at the bench's kp=256 int8 config;
    shapes near the boundary could otherwise pass the gate yet fail to
    compile).  Use :func:`tile_window_bytes_for` to compute it."""
    return (n * d * x_itemsize + n_out * d * 4 + tile_window_bytes
            + slack_bytes) < _VMEM_LIMIT


def tile_window_bytes_for(k_pack: int, stack: int, block: int,
                          tile_itemsize: int = 1,
                          packed4: bool = False) -> int:
    """VMEM bytes of the double-buffered streamed tile window."""
    cols = block // 2 if packed4 else block
    return 2 * k_pack * stack * block * cols * tile_itemsize


# --------------------------------------------------------------------------
# (A K-merged CSR variant — one deep-K [B, kp*B] @ [kp*B, D] dot per grid
# step from resident x — was built and measured here in r3: 7.87e8 edges/s
# powerlaw vs 9.07e8 for the stacked kernel above.  Deeper K did not lift
# MXU efficiency, so it was deleted per the adopt-or-delete rule; see
# BASELINE_MEASURED.md "Round-3 resident-kernel push".)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Differentiable wrapper (x-gradients): the training fast path.  The tile
# values are constants here (adjacency); the explainer's tile-gradient
# path stays on pallas_spmm.bcsr_matvec_dw (SDDMM needs the CSR layout).
# --------------------------------------------------------------------------


def stacked_matvec(st: BCSRStacked, st_t: BCSRStacked, x: jax.Array,
                   interpret: Optional[bool] = None,
                   k_pack: int = 4) -> jax.Array:
    """Differentiable ``A @ x`` on the resident kernel; ``st_t`` holds the
    stacked layout of ``A^T`` for the backward ``dx = A^T @ g``.  Pass
    both as jit ARGUMENTS (see ``pallas_spmm.bcsr_matvec``)."""
    return _stacked_matvec_vjp(st, st_t, x, interpret, k_pack)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _stacked_matvec_vjp(st, st_t, x, interpret, k_pack):
    return spmm_stacked_resident(st, x, k_pack=k_pack, interpret=interpret)


def _stacked_fwd(st, st_t, x, interpret, k_pack):
    return (
        spmm_stacked_resident(st, x, k_pack=k_pack, interpret=interpret),
        # zero-size token carries x's dtype so the backward can return a
        # cotangent matching the PRIMAL dtype (not g's)
        (st, st_t, jnp.zeros((0,), x.dtype)),
    )


def _zero_cotangent(st: BCSRStacked):
    def zero(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        if hasattr(a, "shape"):
            return np.zeros(a.shape, jax.dtypes.float0)
        return None

    return jax.tree_util.tree_map(zero, st)


def _stacked_bwd(interpret, k_pack, res, g):
    # g passes through at its own dtype.  When tiles are bf16/int8 the
    # kernel casts each f32 cotangent slice to bf16 on the VPU before the
    # MXU dot, so the backward x-gradient is computed at bf16 precision
    # (matching the forward's bf16 aggregation; the f32 accumulator keeps
    # the reduction itself exact).  The returned cotangent matches the
    # PRIMAL x dtype (advisor r3).
    st, st_t, x_tok = res
    dx = spmm_stacked_resident(st_t, g, k_pack=k_pack, interpret=interpret)
    return (_zero_cotangent(st), _zero_cotangent(st_t),
            dx.astype(x_tok.dtype))


_stacked_matvec_vjp.defvjp(_stacked_fwd, _stacked_bwd)
