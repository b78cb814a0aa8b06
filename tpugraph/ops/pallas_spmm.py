"""Pallas TPU kernels: block-sparse SpMM and SDDMM.

The hot op of every GNN layer is ``y = A @ x`` (reference ``models.py:70``
does it densely).  Here ``A`` is BCSR (``tpugraph.ops.bcsr``): the kernel
walks the nonempty 128x128 tiles in row-block order, accumulating one
``[B, B] @ [B, D]`` MXU matmul per tile into the output row block held in
VMEM.  Scalar-prefetched ``col_blk`` / ``row_of`` drive the BlockSpec
index maps, so the pipeline DMAs exactly the needed x-blocks from HBM —
no gather instructions, all FLOPs on the MXU.

SDDMM (``dA_tile = dY_row @ X_col^T`` masked to tile support) provides
the mask/attention gradient restricted to edge support — the backward
building block the explainer and GAT layers need at scale.

Both kernels run in interpreter mode off-TPU (tests), and
``make_bcsr_matvec`` wires them into a ``jax.custom_vjp`` so the sparse
aggregation drops into any autodiff'd model.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugraph.ops.bcsr import BCSR, BCSRTranspose, transpose_tiles

LANES = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _spmm_kernel(row_ref, col_ref, tiles_ref, x_ref, out_ref):
    t = pl.program_id(0)
    row = row_ref[t]
    prev_row = row_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, row != prev_row)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile = tiles_ref[0]
    x = x_ref[:]
    if tile.dtype == jnp.int8:
        # int8 tiles (exact for unit/integer weights): convert on the
        # VPU, multiply at bf16 on the MXU — halves the dominant tile
        # HBM stream again vs bf16
        tile = tile.astype(jnp.bfloat16)
    if tile.dtype != x.dtype:
        x = x.astype(tile.dtype)  # bf16 tiles: bf16 x bf16 -> f32 on MXU
    out_ref[:] += jnp.dot(tile, x, preferred_element_type=jnp.float32)


def _spmm_kernel_cast_factory(num_tiles: int, out_dtype):
    """Variant that accumulates in an f32 VMEM scratch and downcasts to
    ``out_dtype`` once per row block (last tile), so a bf16 output only
    pays bf16 HBM write traffic while keeping f32 accumulation."""

    def kernel(row_ref, col_ref, tiles_ref, x_ref, out_ref, acc):
        t = pl.program_id(0)
        row = row_ref[t]
        prev_row = row_ref[jnp.maximum(t - 1, 0)]
        is_first = jnp.logical_or(t == 0, row != prev_row)

        @pl.when(is_first)
        def _():
            acc[:] = jnp.zeros_like(acc)

        tile = tiles_ref[0]
        x = x_ref[:]
        if tile.dtype == jnp.int8:
            tile = tile.astype(jnp.bfloat16)
        if tile.dtype != x.dtype:
            x = x.astype(tile.dtype)
        acc[:] += jnp.dot(tile, x, preferred_element_type=jnp.float32)

        nxt = row_ref[jnp.minimum(t + 1, num_tiles - 1)]
        is_last = jnp.logical_or(t == num_tiles - 1, nxt != row)

        @pl.when(is_last)
        def _():
            out_ref[:] = acc[:].astype(out_dtype)

    return kernel


def spmm_bcsr(m: BCSR, x: jax.Array, interpret: Optional[bool] = None,
              out_dtype=None) -> jax.Array:
    """``y = A @ x`` with A in BCSR.  ``x`` must be ``[N_pad, D]`` with
    ``N_pad == m.num_nodes`` (the padded COLUMN count) and ``D`` a
    multiple of 128 (pad features).  Output is ``[m.num_row_nodes, D]``
    (equal to ``[N_pad, D]`` for square matrices).

    Grid is one step per tile; tiles of one row block are consecutive, so
    the output block stays resident in VMEM across its accumulation
    (Pallas revisiting semantics) and spills to HBM once per row block.

    ``out_dtype`` (default float32) selects the HBM output precision;
    accumulation is always f32 on the MXU.  MEASURED (r3, bench): prefer
    ``out_dtype=float32`` and cast the RESULT to bf16 with a normal XLA
    elementwise op when the consumer wants bf16 — the in-kernel
    ``bfloat16`` downcast store (scratch accumulator + per-row-block
    cast) ran ~40% slower than f32-out on both bench graphs, more than
    erasing the halved write traffic.  The real bf16 win is on the INPUT
    side: bf16-resident x halves this kernel's gather DMA bytes (the
    powerlaw bench's 1.79x).
    """
    n, d = x.shape
    assert n == m.num_nodes, (n, m.num_nodes)
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    b = m.block
    t = m.num_tiles
    n_out = m.num_row_nodes
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = jnp.float32
    out_dtype = jnp.dtype(out_dtype)

    if out_dtype == jnp.float32:
        kernel = _spmm_kernel
        scratch = []
    else:
        kernel = _spmm_kernel_cast_factory(t, out_dtype)
        scratch = [pltpu.VMEM((b, d), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, b), lambda i, row, col: (i, 0, 0)),
            pl.BlockSpec((b, d), lambda i, row, col: (col[i], 0)),
        ],
        out_specs=pl.BlockSpec((b, d), lambda i, row, col: (row[i], 0)),
        scratch_shapes=scratch,
    )
    flops = 2 * t * b * b * d
    tile_b = jnp.dtype(m.tiles.dtype).itemsize
    x_b = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=t * b * b * tile_b + t * b * d * x_b
            + n_out * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m.row_of, m.col_blk, m.tiles, x)


def _sddmm_kernel(row_ref, col_ref, dy_ref, x_ref, support_ref, out_ref):
    prod = jax.lax.dot_general(
        dy_ref[:],
        x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),  # dy @ x^T
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = prod * (support_ref[0] != 0)


def sddmm_bcsr(
    m: BCSR, dy: jax.Array, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """Per-tile gradient ``dA = (dY @ X^T) * support`` — SDDMM restricted
    to the BCSR sparsity pattern.  Returns ``float32[T, B, B]``.
    Rect-aware: ``dy`` spans the ROW nodes, ``x`` the COLUMN nodes."""
    n, d = x.shape
    assert n == m.num_nodes, (n, m.num_nodes)
    assert dy.shape == (m.num_row_nodes, d), (dy.shape, m.num_row_nodes)
    assert d % LANES == 0
    b = m.block
    t = m.num_tiles
    if interpret is None:
        interpret = not _on_tpu()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, row, col: (row[i], 0)),
            pl.BlockSpec((b, d), lambda i, row, col: (col[i], 0)),
            pl.BlockSpec((1, b, b), lambda i, row, col: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, b), lambda i, row, col: (i, 0, 0)),
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * b * d,
            bytes_accessed=2 * t * b * d * 4 + 2 * t * b * b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m.row_of, m.col_blk, dy, x, m.tiles)


def _spmm_packed_kernel_factory(k_pack: int, block: int, d: int):
    def kernel(row_ref, col_ref, tiles_ref, x_hbm, out_ref, xbuf, sems):
        i = pl.program_id(0)
        base = i * k_pack
        row = row_ref[base]
        prev_row = row_ref[jnp.maximum(base - 1, 0)]
        is_first = jnp.logical_or(i == 0, row != prev_row)

        @pl.when(is_first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(col_ref[base + j] * block, block), :],
                xbuf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < k_pack)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            xv = xbuf[slot]
            tile = tiles_ref[j]
            if tile.dtype == jnp.int8:
                tile = tile.astype(jnp.bfloat16)
            if xv.dtype != tile.dtype:
                xv = xv.astype(tile.dtype)
            out_ref[:] += jnp.dot(
                tile, xv, preferred_element_type=jnp.float32
            )

        jax.lax.fori_loop(0, k_pack, body, None)

    return kernel


def _spmm_packed_kernel_cast_factory(k_pack: int, block: int, d: int,
                                     num_tiles: int, out_dtype):
    """Packed kernel with f32 scratch accumulation + one ``out_dtype``
    downcast store per row block (see :func:`_spmm_kernel_cast_factory`)."""

    def kernel(row_ref, col_ref, tiles_ref, x_hbm, out_ref, xbuf, sems, acc):
        i = pl.program_id(0)
        base = i * k_pack
        row = row_ref[base]
        prev_row = row_ref[jnp.maximum(base - 1, 0)]
        is_first = jnp.logical_or(i == 0, row != prev_row)

        @pl.when(is_first)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(col_ref[base + j] * block, block), :],
                xbuf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < k_pack)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            xv = xbuf[slot]
            tile = tiles_ref[j]
            if tile.dtype == jnp.int8:
                tile = tile.astype(jnp.bfloat16)
            if xv.dtype != tile.dtype:
                xv = xv.astype(tile.dtype)
            acc[:] += jnp.dot(
                tile, xv, preferred_element_type=jnp.float32
            )

        jax.lax.fori_loop(0, k_pack, body, None)

        nxt = row_ref[jnp.minimum(base + k_pack, num_tiles - 1)]
        is_last = jnp.logical_or(base + k_pack >= num_tiles, nxt != row)

        @pl.when(is_last)
        def _():
            out_ref[:] = acc[:].astype(out_dtype)

    return kernel


def spmm_bcsr_packed(
    m: BCSR,
    x: jax.Array,
    k_pack: int = 4,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """SpMM v2: ``k_pack`` tiles per grid step with double-buffered manual
    DMA of the x-blocks from HBM — amortizes per-step pipeline overhead.

    Requires each row block's tile count to be a multiple of ``k_pack``
    (use :func:`tpugraph.ops.bcsr.bcsr_pad_rows`).

    ``out_dtype=bfloat16`` keeps accumulation f32 in VMEM scratch and
    downcasts once per row block — measured ~40% SLOWER than f32 out +
    an XLA cast outside the kernel (see :func:`spmm_bcsr`); kept for API
    completeness.  Feed bf16 ``x`` instead (the manual DMA buffer
    matches the HBM dtype of ``x``): that is the memory-bound win."""
    n, d = x.shape
    assert n == m.num_nodes
    assert d % LANES == 0
    b = m.block
    t = m.num_tiles
    n_out = m.num_row_nodes
    assert t % k_pack == 0, f"pad tiles per row to a multiple of {k_pack}"
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = jnp.float32
    out_dtype = jnp.dtype(out_dtype)

    scratch = [
        # manual-DMA buffer must match the HBM source dtype (bf16 x
        # halves the gather traffic; accumulation stays f32 via the MXU)
        pltpu.VMEM((2, b, d), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if out_dtype == jnp.float32:
        kernel = _spmm_packed_kernel_factory(k_pack, b, d)
    else:
        kernel = _spmm_packed_kernel_cast_factory(k_pack, b, d, t, out_dtype)
        scratch.append(pltpu.VMEM((b, d), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // k_pack,),
        in_specs=[
            pl.BlockSpec((k_pack, b, b), lambda i, row, col: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, d), lambda i, row, col: (row[i * k_pack], 0)),
        scratch_shapes=scratch,
    )
    tile_b = jnp.dtype(m.tiles.dtype).itemsize
    x_b = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * b * d,
            bytes_accessed=t * b * b * tile_b + t * b * d * x_b
            + n_out * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m.row_of, m.col_blk, m.tiles, x)


def _spmm_any(m: BCSR, x: jax.Array, interpret, k_pack) -> jax.Array:
    if k_pack and k_pack > 1:
        return spmm_bcsr_packed(m, x, k_pack=k_pack, interpret=interpret)
    return spmm_bcsr(m, x, interpret=interpret)


def bcsr_matvec(m: BCSR, m_t: BCSR, x: jax.Array,
                interpret: Optional[bool] = None,
                k_pack: Optional[int] = None) -> jax.Array:
    """Differentiable sparse aggregation ``A @ x`` with a custom VJP
    (``dx = A^T @ g`` via the transposed BCSR — no XLA scatter in the
    backward pass).

    ``k_pack > 1`` routes both directions through the double-buffered
    packed kernel (+15-19%% measured; ``m``/``m_t`` must be
    ``bcsr_pad_rows``-padded to that multiple).

    IMPORTANT: pass ``m``/``m_t`` as *arguments* through any enclosing
    ``jit`` — closing over them bakes the tile arrays into the HLO as
    constants, which (a) can exceed compile-payload limits and (b) was
    measured to cost ~150x in steady-state dispatch (26 ms vs 0.19 ms for
    a 2560-tile SpMM on v5e)."""
    return _bcsr_matvec_vjp(m, m_t, x, interpret, k_pack)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bcsr_matvec_vjp(m, m_t, x, interpret, k_pack):
    return _spmm_any(m, x, interpret, k_pack)


def _matvec_fwd(m, m_t, x, interpret, k_pack):
    return _spmm_any(m, x, interpret, k_pack), (m, m_t)


def _zero_cotangent(m: BCSR):
    import numpy as np

    def zero(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        if hasattr(a, "shape"):
            return np.zeros(a.shape, jax.dtypes.float0)
        return None  # static fields (num_nodes, block)

    return jax.tree_util.tree_map(zero, m)


def _matvec_bwd(interpret, k_pack, res, g):
    m, m_t = res
    dx = _spmm_any(m_t, g, interpret, k_pack)
    return (_zero_cotangent(m), _zero_cotangent(m_t), dx)


_bcsr_matvec_vjp.defvjp(_matvec_fwd, _matvec_bwd)


def make_bcsr_matvec(
    m: BCSR, m_t: BCSR, interpret: Optional[bool] = None
) -> Callable[[jax.Array], jax.Array]:
    """Closure-based convenience wrapper around :func:`bcsr_matvec`.
    Only use for SMALL graphs — see the constant-baking warning there."""

    def matvec(x):
        return bcsr_matvec(m, m_t, x, interpret=interpret)

    return matvec


# --------------------------------------------------------------------------
# Differentiable-weights path: gradients flow into the TILES as well as x.
# This is what lets the GNNExplainer mask optimization (masked adjacency =
# tiles * sigmoid(mask), reference explain.py:665-715) and GAT attention run
# on the Pallas fast path instead of the 64x-slower COO segment_sum path.
# --------------------------------------------------------------------------


def bcsr_matvec_dw(
    m: BCSR, tp: BCSRTranspose, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """``y = A @ x`` differentiable w.r.t. BOTH ``m.tiles`` and ``x``.

    Backward pass (all on-device Pallas kernels):
      * ``dx = A^T @ g`` — SpMM over tiles transposed on the fly via the
        :class:`BCSRTranspose` plan (permute + per-tile transpose).
      * ``dtiles = (g @ x^T) * support`` — SDDMM restricted to the tile
        support, the block-sparse analog of the reference's dense mask
        gradient (``explain.py:740-820``).

    ``support`` is the nonzero pattern of the *current* tiles; entries at
    exactly 0 get zero gradient — harmless for multiplicative gates
    (``W = base * gate``: the chain rule kills those entries anyway).
    Pass ``m``/``tp`` as jit ARGUMENTS (see :func:`bcsr_matvec`).
    """
    return _bcsr_matvec_dw(m, tp, x, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bcsr_matvec_dw(m, tp, x, interpret):
    return spmm_bcsr(m, x, interpret=interpret)


def _dw_fwd(m, tp, x, interpret):
    return spmm_bcsr(m, x, interpret=interpret), (m, tp, x)


def _replace_tiles_cotangent(m: BCSR, dtiles: jax.Array):
    dm = _zero_cotangent(m)
    import dataclasses

    return dataclasses.replace(dm, tiles=dtiles)


def _dw_bwd(interpret, res, g):
    m, tp, x = res
    m_t = BCSR(
        tiles=transpose_tiles(m.tiles, tp),
        col_blk=tp.col_blk,
        row_ptr=tp.row_ptr,
        row_of=tp.row_of,
        num_nodes=tp.num_nodes,
        block=tp.block,
    )
    dx = spmm_bcsr(m_t, g, interpret=interpret)
    dtiles = sddmm_bcsr(m, g, x, interpret=interpret)
    return (_replace_tiles_cotangent(m, dtiles), _zero_cotangent(tp), dx)


_bcsr_matvec_dw.defvjp(_dw_fwd, _dw_bwd)


def bcsr_matvec_dw_pair(
    m: BCSR, m_t: BCSR, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """Like :func:`bcsr_matvec_dw` but with the transposed tiles supplied
    by the caller.  When one masked adjacency feeds several layers (the
    explainer's L-layer forward), computing ``W^T`` once per step instead
    of once per layer-backward saves two full [T, B, B] permute+transpose
    passes per step.  ``m_t`` must hold the tiles of ``m``'s transpose
    (e.g. ``transpose_tiles(m.tiles, tp)`` with the matching structure);
    it is treated as a precomputed constant — its cotangent is zero, and
    the gradient w.r.t. the weights flows through ``m.tiles`` only (which
    is mathematically complete: ``y = A @ x`` depends on A alone).
    """
    return _bcsr_matvec_dw_pair(m, m_t, x, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bcsr_matvec_dw_pair(m, m_t, x, interpret):
    return spmm_bcsr(m, x, interpret=interpret)


def _dw_pair_fwd(m, m_t, x, interpret):
    return spmm_bcsr(m, x, interpret=interpret), (m, m_t, x)


def _dw_pair_bwd(interpret, res, g):
    m, m_t, x = res
    dx = spmm_bcsr(m_t, g, interpret=interpret)
    dtiles = sddmm_bcsr(m, g, x, interpret=interpret)
    return (_replace_tiles_cotangent(m, dtiles), _zero_cotangent(m_t), dx)


_bcsr_matvec_dw_pair.defvjp(_dw_pair_fwd, _dw_pair_bwd)


def sddmm_dw(
    m: BCSR,
    tp: BCSRTranspose,
    a: jax.Array,
    b: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Differentiable SDDMM: per-tile ``scores = (a_row @ b_col^T) * support``.

    The GAT attention scores on the block-sparse path
    (reference ``models.py:62-68`` computes the same product densely).
    Backward: ``da = S_g @ b`` and ``db = S_g^T @ a`` where ``S_g`` is the
    support-masked score cotangent — both are SpMMs with the cotangent
    tiles as values, so the whole GAT layer stays on the MXU.
    """
    return _sddmm_dw(m, tp, a, b, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sddmm_dw(m, tp, a, b, interpret):
    return sddmm_bcsr(m, a, b, interpret=interpret)


def _sddmm_dw_fwd(m, tp, a, b, interpret):
    return sddmm_bcsr(m, a, b, interpret=interpret), (m, tp, a, b)


def _sddmm_dw_bwd(interpret, res, g_scores):
    m, tp, a, b = res
    gs = g_scores * (m.tiles != 0)
    import dataclasses

    m_gs = dataclasses.replace(m, tiles=gs)
    da = spmm_bcsr(m_gs, b, interpret=interpret)
    m_gs_t = BCSR(
        tiles=transpose_tiles(gs, tp),
        col_blk=tp.col_blk,
        row_ptr=tp.row_ptr,
        row_of=tp.row_of,
        num_nodes=tp.num_nodes,
        block=tp.block,
    )
    db = spmm_bcsr(m_gs_t, a, interpret=interpret)
    # scores depend on m.tiles only through the support pattern (not values)
    return (_zero_cotangent(m), _zero_cotangent(tp), da, db)


_sddmm_dw.defvjp(_sddmm_dw_fwd, _sddmm_dw_bwd)
