"""Pallas TPU SpMM over the edge-packet format (low-locality graphs).

See ``tpugraph.ops.packets`` for the format rationale.  The kernel
processes ``PK`` packets per grid step (the 8-sublane tiling floor for
the int32 edge blocks); for each packet of K edges targeting output row
block ``row_of[i]`` with x window ``col_blk[i]``:

  1. VPU builds the weighted one-hot gather matrix
     ``ohc[K, Bc] = w[e] at (e, cols[e])`` by iota-compare.
  2. MXU gathers+scales: ``g[K, D] = ohc @ x_win``.
  3. VPU builds the scatter one-hot ``ohr[Br, K] = 1 at (rows[e], e)``.
  4. MXU scatters: ``out[Br, D] += ohr @ g``.

Dead slots (w=0) contribute nothing in step 2, so their scatter rows
add zeros.  Output row blocks accumulate across consecutive steps via
Pallas revisiting semantics exactly like ``pallas_spmm``; the packer
sorts packets by row block and pads each row block's packet count to a
multiple of PK.

x windows are fetched from HBM by double-buffered manual DMA (a fully
VMEM-resident x exceeds the v5e VMEM budget at bench scale; measured
r3: the DMA costs only ~4% of the kernel).

Per packet the kernel streams ~1.5 KB of edge data from HBM instead of
a 131 KB dense bf16 tile — on 0.1%-dense power-law graphs this removes
~95% of the dense-tile kernel's HBM traffic and turns the op
compute-bound.  Replaces reference ``models.py:70`` (dense ``adj @ x``)
in the low-locality regime.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugraph.ops.packets import EdgePackets

LANES = 128
PK = 8  # default packets per grid step (int32 sublane tiling floor)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _packet_kernel_factory(k: int, br: int, bc: int, d: int, compute_dtype,
                           num_steps: int, out_dtype, pk: int):
    """One grid step = ``pk`` packets sharing an output row block.

    Two structural choices, both from r3 on-chip measurements:

    * The inner loop is UNROLLED and the per-packet gather results are
      staged in a VMEM buffer so the scatter is ONE merged matmul
      ``[Br, pk*K] @ [pk*K, D]`` per step.  The naive per-packet loop of
      dependent small matmuls ran the MXU at ~23% — a ``[K<=256, Bc]``
      gather occupies at most 1-2 of the 4 MXU output tiles and each
      packet's scatter depended on its gather.  Merging the scatter
      yields a 4-tile-wide matmul and leaves the independent gathers
      free to pipeline.
    * The x-window DMAs run on a CROSS-STEP ring: step ``i`` issues ALL
      of step ``i+1``'s window copies before doing its own compute, so
      no wait is latency-exposed.  (Mosaic pipelines BlockSpec-managed
      operands across grid steps automatically, but manual in-body DMAs
      are sequenced with the body — the within-step double buffer alone
      left a ~2.3 us/step latency floor.)"""
    cd = compute_dtype
    cast_out = jnp.dtype(out_dtype) != jnp.float32

    def kernel(row_ref, col_ref, rows_ref, cols_ref, w_ref, x_ref, out_ref,
               xbuf, sems, gbuf, ohrbuf, *scratch):
        acc = scratch[0] if cast_out else out_ref

        i = pl.program_id(0)
        base = i * pk
        row = row_ref[base]
        prev = row_ref[jnp.maximum(base - 1, 0)]
        is_first = jnp.logical_or(i == 0, row != prev)

        @pl.when(is_first)
        def _():
            acc[:] = jnp.zeros_like(acc)

        lane_c = jax.lax.broadcasted_iota(jnp.int32, (k, bc), 1)
        sub_r = jax.lax.broadcasted_iota(jnp.int32, (br, k), 0)

        def dma(bank, j, packet):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(col_ref[packet] * bc, bc), :],
                xbuf.at[bank, j],
                sems.at[bank, j],
            )

        bank = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            for j in range(pk):
                dma(0, j, j).start()

        @pl.when(i + 1 < num_steps)
        def _():
            for j in range(pk):
                dma(1 - bank, j, base + pk + j).start()

        for j in range(pk):  # unrolled
            dma(bank, j, base + j).wait()
            xb = xbuf[bank, j]
            if xb.dtype != cd:
                xb = xb.astype(cd)
            cl = cols_ref[j]  # [K] int32
            rl = rows_ref[j]
            wv = w_ref[j]
            # one-hot by compare -> cast -> scale (a `where` on the i1
            # mask with broadcast operands trips a Mosaic relayout bug:
            # "Non-singleton logical dimension is replicated in
            # destination but not in source for vector<KxBcxi1>")
            eqc = (cl[:, None] == lane_c).astype(cd)
            ohc = eqc * wv[:, None].astype(cd)
            g = jnp.dot(ohc, xb, preferred_element_type=jnp.float32)
            gbuf[pl.ds(j * k, k), :] = g.astype(cd)
            ohrbuf[:, pl.ds(j * k, k)] = (sub_r == rl[None, :]).astype(cd)

        acc[:] += jnp.dot(
            ohrbuf[:], gbuf[:], preferred_element_type=jnp.float32
        )

        if cast_out:
            nxt = row_ref[jnp.minimum(base + pk, num_steps * pk - 1)]
            is_last = jnp.logical_or(base + pk >= num_steps * pk, nxt != row)

            @pl.when(is_last)
            def _():
                out_ref[:] = acc[:].astype(out_dtype)

    return kernel


def spmm_packets(
    p: EdgePackets,
    x: jax.Array,
    interpret: Optional[bool] = None,
    out_dtype=None,
    compute_dtype=None,
    pk: int = PK,
) -> jax.Array:
    """``y = A @ x`` with A in edge-packet form.  ``x`` must be
    ``[p.num_nodes, D]`` with D a multiple of 128; ``p`` must be packed
    with ``pk_multiple=pk`` (``pack_edges`` default 8; ``pk`` must be a
    multiple of 8 for the int32 sublane tiling).

    ``compute_dtype`` is the one-hot / MXU input precision: ``bfloat16``
    (default on TPU — exact on the one-hot side since entries are
    weights and 0/1; x is rounded to bf16 like the dense-tile bf16
    path) or ``float32`` (default in interpret mode, exact for tests).
    Accumulation is always f32.
    """
    n, d = x.shape
    assert n == p.num_nodes, (n, p.num_nodes)
    assert d % LANES == 0, f"pad feature dim {d} to a multiple of {LANES}"
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    if out_dtype is None:
        out_dtype = jnp.float32
    out_dtype = jnp.dtype(out_dtype)
    br, bc, k = p.block_r, p.block_c, p.k
    np_ = p.num_packets
    assert pk % 8 == 0, f"pk must be a multiple of 8, got {pk}"
    assert np_ % pk == 0, f"pad packet count to a multiple of {pk}"
    num_steps = np_ // pk

    scratch = [
        pltpu.VMEM((2, pk, bc, d), x.dtype),      # cross-step window ring
        pltpu.SemaphoreType.DMA((2, pk)),
        pltpu.VMEM((pk * k, d), compute_dtype),   # staged gather results
        pltpu.VMEM((br, pk * k), compute_dtype),  # merged scatter one-hot
    ]
    if out_dtype != jnp.float32:
        scratch.append(pltpu.VMEM((br, d), jnp.float32))

    x_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((pk, k), lambda i, row, col: (i, 0)),
            pl.BlockSpec((pk, k), lambda i, row, col: (i, 0)),
            pl.BlockSpec((pk, k), lambda i, row, col: (i, 0)),
            x_spec,
        ],
        out_specs=pl.BlockSpec((br, d), lambda i, row, col: (row[i * pk], 0)),
        scratch_shapes=scratch,
    )
    w_b = jnp.dtype(p.w.dtype).itemsize
    x_b = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        _packet_kernel_factory(
            k, br, bc, d, compute_dtype, num_steps, out_dtype, pk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * k * (br + bc) * d,
            bytes_accessed=np_ * k * (8 + w_b) + np_ * bc * d * x_b
            + n * d * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(p.row_of, p.col_blk, p.rows, p.cols, p.w, x)


def packets_matvec(
    p: EdgePackets,
    p_t: EdgePackets,
    x: jax.Array,
    interpret: Optional[bool] = None,
    out_dtype=None,
    compute_dtype=None,
    pk: int = PK,
) -> jax.Array:
    """Differentiable ``A @ x`` on the packet path: custom VJP with
    ``dx = A^T @ g`` via the transposed packet plan (``p_t``), mirroring
    :func:`tpugraph.ops.pallas_spmm.bcsr_matvec`.  Pass ``p``/``p_t`` as
    jit ARGUMENTS (closures bake the arrays into the HLO)."""
    return _packets_matvec_vjp(p, p_t, x, interpret, out_dtype,
                               compute_dtype, pk)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packets_matvec_vjp(p, p_t, x, interpret, out_dtype, compute_dtype, pk):
    return spmm_packets(p, x, interpret, out_dtype, compute_dtype, pk)


def _pm_fwd(p, p_t, x, interpret, out_dtype, compute_dtype, pk):
    return (
        spmm_packets(p, x, interpret, out_dtype, compute_dtype, pk),
        (p, p_t),
    )


def _zero_cotangent(p):
    import numpy as np

    def zero(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        if hasattr(a, "shape"):
            return np.zeros(a.shape, jax.dtypes.float0)
        return None

    return jax.tree_util.tree_map(zero, p)


def _pm_bwd(interpret, out_dtype, compute_dtype, pk, res, g):
    p, p_t = res
    if g.dtype != jnp.float32 and (out_dtype is None
                                   or jnp.dtype(out_dtype) == jnp.float32):
        g = g.astype(jnp.float32)
    dx = spmm_packets(p_t, g, interpret, out_dtype, compute_dtype, pk)
    return (_zero_cotangent(p), _zero_cotangent(p_t), dx)


_packets_matvec_vjp.defvjp(_pm_fwd, _pm_bwd)
