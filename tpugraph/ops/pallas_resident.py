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


def _pair_kernel_factory(k_pack: int, block: int, g1: int):
    """Fused ``A_t @ (A @ x)`` kernel: phase 1 (grid steps < g1) streams
    A's tiles and accumulates y in a resident f32 scratch; the phase
    boundary downcasts y ONCE to a resident bf16 scratch; phase 2
    streams A_t's tiles against it into the resident output.  The
    concatenated rows/col prefetch tables index uniformly as
    ``i * k_pack + j`` because phase 2's table offset (t1) equals
    ``g1 * k_pack``."""

    def kernel(rows_ref, col_ref, t1_ref, t2_ref, x_ref, out_ref,
               yacc_ref, ybf_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            yacc_ref[:] = jnp.zeros_like(yacc_ref)

        @pl.when(i < g1)
        def _():
            base = i * k_pack
            for j in range(k_pack):
                tile = t1_ref[j]
                if tile.dtype == jnp.int8:
                    tile = tile.astype(jnp.bfloat16)
                xv = x_ref[pl.ds(col_ref[base + j] * block, block), :]
                if xv.dtype != tile.dtype:
                    xv = xv.astype(tile.dtype)
                acc = jnp.dot(tile, xv,
                              preferred_element_type=jnp.float32)
                r0 = rows_ref[base + j] * block
                yacc_ref[pl.ds(r0, block), :] += acc

        @pl.when(i == g1)
        def _():
            # one whole-array downcast at the phase boundary (the r4
            # lesson: a single resident downcast is cheap, per-tile
            # casts put the VPU on the critical path)
            ybf_ref[:] = yacc_ref[:].astype(jnp.bfloat16)
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(i >= g1)
        def _():
            base = i * k_pack
            for j in range(k_pack):
                tile = t2_ref[j]
                if tile.dtype == jnp.int8:
                    tile = tile.astype(jnp.bfloat16)
                yv = ybf_ref[pl.ds(col_ref[base + j] * block, block), :]
                acc = jnp.dot(tile, yv,
                              preferred_element_type=jnp.float32)
                r0 = rows_ref[base + j] * block
                out_ref[pl.ds(r0, block), :] += acc

    return kernel


def spmm_pair_resident(
    m: BCSRStacked,
    m_t: BCSRStacked,
    x: jax.Array,
    k_pack: int = 16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``dx = A^T @ (A @ x)`` in ONE ``pallas_call`` (VERDICT r4 item 3).

    The per-call decomposition (``bench_palcall_diag.py``, r5) showed the
    resident chain's above-MXU-floor cost is ~104 us of multi-step-GRID
    machinery per call (a trivial kernel costs 0.3 us at grid=1 but
    ~110 us at grid>=2) plus ~1.2 us/MB of resident-buffer traffic —
    with 2 calls/iter that is the entire ~0.4 ms gap to the dense-FLOP
    floor.  Fusing the fwd+bwd pair halves the call count and keeps the
    intermediate ``y`` in VMEM between phases (no writeback + reload):
    grid = A's steps + A_t's steps, a one-step phase boundary downcasts
    y to bf16, and the concatenated prefetch tables make both phases
    index identically.

    This is the propagation primitive ``A_t(A x)`` (power iteration /
    diffusion / the bench's chained fwd+bwd); it is NOT usable inside
    training's fwd/bwd, which are separated by the loss.  ``stack`` must
    be 1 for both operands; x is ``[num_nodes, D]`` (bf16 recommended),
    output ``[m_t.num_row_nodes, D]`` f32.  Not differentiable (static
    weights by construction).
    """
    n, d = x.shape
    assert m.stack == 1 and m_t.stack == 1, "pair kernel is stack=1 only"
    assert not m.packed4 and not m_t.packed4
    assert n == m.num_nodes, (n, m.num_nodes)
    assert m_t.num_nodes == m.num_row_nodes, "m_t columns must be m rows"
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    b = m.block
    assert m_t.block == b
    t1, t2 = m.num_tiles, m_t.num_tiles
    assert t1 % k_pack == 0 and t2 % k_pack == 0, (t1, t2, k_pack)
    g1, g2 = t1 // k_pack, t2 // k_pack
    n_mid = m.num_row_nodes
    n_out = m_t.num_row_nodes
    if interpret is None:
        interpret = not _on_tpu()

    win = 2 * tile_window_bytes_for(
        k_pack, 1, b, jnp.dtype(m.tiles.dtype).itemsize
    )
    # resident: x + y_acc f32 + y_bf16 + out f32
    extra = n_mid * d * 4 + n_mid * d * 2 + n_out * d * 4
    assert resident_fits(n, 0, d, x.dtype.itemsize,
                         tile_window_bytes=win + extra), (
        f"pair-resident buffers exceed VMEM: x[{n},{d}] + y[{n_mid},{d}]"
        f" f32+bf16 + out[{n_out},{d}]"
    )

    rows_all = jnp.concatenate([m.rows, m_t.rows])
    col_all = jnp.concatenate([m.col_blk, m_t.col_blk])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g1 + g2,),
        in_specs=[
            # phase-1 stream: frozen at its last block during phase 2
            # (Mosaic skips the DMA when the block index is unchanged)
            pl.BlockSpec((k_pack, b, b),
                         lambda i, rows, col: (jnp.minimum(i, g1 - 1),
                                               0, 0)),
            # phase-2 stream: pinned at block 0 until the boundary
            pl.BlockSpec((k_pack, b, b),
                         lambda i, rows, col: (jnp.maximum(i - g1, 0),
                                               0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_mid, d), jnp.float32),
            pltpu.VMEM((n_mid, d), jnp.bfloat16),
        ],
    )
    tile_b = jnp.dtype(m.tiles.dtype).itemsize
    return pl.pallas_call(
        _pair_kernel_factory(k_pack, b, g1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (t1 + t2) * b * b * d,
            bytes_accessed=(t1 + t2) * b * b * tile_b
            + n * d * x.dtype.itemsize + n_out * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rows_all, col_all, m.tiles, m_t.tiles, x)


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
