"""Block-CSR (BCSR) sparse format for TPU.

TPU MXUs consume dense 128x128 tiles; scalar gather/scatter is slow.  So
the Pallas fast path stores the adjacency as *dense tiles over the
nonempty 128x128 blocks* of the (row=receiver, col=sender) matrix:

  tiles    float32[T, B, B]  — dense tile values
  col_blk  int32[T]          — column block index of each tile
  row_ptr  int32[R+1]        — CSR offsets over row blocks
  row_of   int32[T]          — row block index per tile (= CSR expansion)

Motif/locality-rich graphs (syn*, Enron, PPI) have high per-tile density
after node ordering; each tile feeds one 128x128xD MXU matmul.  The
conversion is a one-time host-side cost.  Reference equivalent: none —
the reference is dense N^2 (``models.py:70``); this is the TPU-native
replacement (SURVEY §2.2 "Intra-op/device kernels").
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


import dataclasses


@dataclasses.dataclass
class BCSR:
    """Registered pytree: the four arrays are leaves; ``num_nodes`` and
    ``block`` are static metadata, so a BCSR can be passed straight
    through ``jit`` boundaries (do this — closing over the tile array
    bakes hundreds of MB of constants into the HLO and costs ~150x in
    dispatch).

    The matrix may be rectangular (``bcsr_from_coo(num_col_nodes=...)``,
    used by the per-shard halo path whose columns span [local | halo]):
    ``num_nodes`` is the COLUMN count (rows of ``x`` in ``A @ x``); the
    row count is ``num_row_blocks * block``.  For the square case the
    two coincide."""

    tiles: jax.Array     # float32[T, B, B]
    col_blk: jax.Array   # int32[T]
    row_ptr: jax.Array   # int32[R+1]
    row_of: jax.Array    # int32[T]
    num_nodes: int       # padded COLUMN count (C * B)  [static]
    block: int           # tile edge length             [static]

    @property
    def num_tiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def num_row_blocks(self) -> int:
        return self.row_ptr.shape[0] - 1

    @property
    def num_row_nodes(self) -> int:
        return (self.row_ptr.shape[0] - 1) * self.block

    def __iter__(self):  # keep NamedTuple-style unpacking working
        return iter(
            (self.tiles, self.col_blk, self.row_ptr, self.row_of,
             self.num_nodes, self.block)
        )


jax.tree_util.register_dataclass(
    BCSR,
    data_fields=["tiles", "col_blk", "row_ptr", "row_of"],
    meta_fields=["num_nodes", "block"],
)


def bcsr_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    pad_tiles_to: Optional[int] = None,
    tile_dtype=None,
    pad_rows_to: Optional[int] = None,
    num_col_nodes: Optional[int] = None,
    device: bool = True,
) -> BCSR:
    """Host-side COO -> BCSR conversion.  Convention matches
    ``ops.message.spmm``: entry (row=receiver, col=sender) = weight.

    ``device=False`` keeps the arrays as numpy (no upload) — for callers
    that post-process the layout on the host (e.g.
    ``pallas_resident.stack_bcsr``) before uploading; pulling uploaded
    tiles back through this platform's transfer tunnel costs minutes at
    20k+ tiles.

    ``num_col_nodes`` makes the matrix rectangular: receivers (rows) live
    in ``[0, num_nodes)``, senders (columns, i.e. rows of ``x``) in
    ``[0, num_col_nodes)``.  Default: square.

    ``tile_dtype`` (e.g. ``jnp.bfloat16``) casts the packed tiles on the
    HOST before the device upload — at 20k+ 256-square tiles the f32
    upload alone is tens of seconds through this platform's transfer
    tunnel, so halving the bytes first matters.

    ``pad_rows_to`` pads every row block's tile count to that multiple
    (dead tiles) HERE, on the host, before the upload — the packed
    kernel's layout requirement.  Choose the value with
    :func:`coo_tile_counts` + :func:`choose_k_pack_counts`; a post-hoc
    :func:`bcsr_pad_rows` on a device-resident BCSR costs a fresh
    eager-scatter compile (or, worse, a multi-GB host round trip)."""
    _wrap = jnp.asarray if device else (lambda a: a)

    def _finalize(tiles_np, col_blk, row_of, row_ptr):
        # cast to the compact dtype FIRST, pad second: the padded copy is
        # then allocated at the compact size (a 20k-tile f32 intermediate
        # is ~5 GB; bf16 halves it)
        if tile_dtype is not None:
            dt = jnp.dtype(tile_dtype)
            if dt == jnp.int8:
                tiles_np = np.clip(np.rint(tiles_np), -127, 127)
            tiles_np = tiles_np.astype(dt)
        counts = np.diff(row_ptr)
        k = pad_rows_to or 1
        if k > 1 or np.any(counts == 0):
            dst, col_blk, row_of, row_ptr, t_new = _pad_rows_layout(
                np.asarray(row_ptr), np.asarray(row_of),
                np.asarray(col_blk), k,
            )
            padded = np.zeros((t_new,) + tiles_np.shape[1:],
                              dtype=tiles_np.dtype)
            padded[dst] = tiles_np[: len(dst)]
            tiles_np = padded
        return BCSR(
            tiles=_wrap(tiles_np),
            col_blk=_wrap(col_blk),
            row_ptr=_wrap(row_ptr),
            row_of=_wrap(row_of),
            num_nodes=n_pad_c,
            block=block,
        )

    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    weights = np.asarray(weights, dtype=np.float32)
    live = weights != 0
    s, r, w = senders[live], receivers[live], weights[live]

    n_pad_r = ((num_nodes + block - 1) // block) * block
    n_pad_c = ((
        (num_col_nodes if num_col_nodes is not None else num_nodes)
        + block - 1
    ) // block) * block
    n_rb = n_pad_r // block
    n_cb = n_pad_c // block

    # Fast path: native C++ tile packer (tpugraph.native), ~100x the
    # Python loop below on million-edge graphs (square matrices only).
    # The FUSED variant emits the padded-row layout at the target dtype
    # in one pass (no f32 intermediate, no numpy pad copy).
    if n_pad_r == n_pad_c:
        try:
            from tpugraph import native

            if native.native_available():
                if pad_tiles_to is None:
                    fused = native.bcsr_pack_fused(
                        r, s, w, n_pad_r, block,
                        k_pack=pad_rows_to or 1,
                        tile_dtype=tile_dtype or np.float32,
                    )
                    if fused is not None:
                        tiles, col_blk, row_of, row_ptr, _ = fused
                        return BCSR(
                            tiles=_wrap(tiles),
                            col_blk=_wrap(col_blk),
                            row_ptr=_wrap(row_ptr),
                            row_of=_wrap(row_of),
                            num_nodes=n_pad_c,
                            block=block,
                        )
                tiles, col_blk, row_of, row_ptr, _ = native.bcsr_pack(
                    r, s, w, n_pad_r, block, pad_tiles_to
                )
                return _finalize(tiles, col_blk, row_of, row_ptr)
        except ValueError:
            raise
        except Exception:
            pass  # fall through to the NumPy implementation

    rb = r // block
    cb = s // block
    keys = rb.astype(np.int64) * n_cb + cb
    order = np.argsort(keys, kind="stable")
    s, r, w, keys = s[order], r[order], w[order], keys[order]
    uniq, start_idx = np.unique(keys, return_index=True)

    t = len(uniq)
    t_pad = pad_tiles_to or max(t, 1)
    if t_pad < t:
        raise ValueError(f"tile budget too small: {t} > {t_pad}")
    tiles = np.zeros((t_pad, block, block), dtype=np.float32)
    col_blk = np.zeros((t_pad,), dtype=np.int32)
    row_of = np.zeros((t_pad,), dtype=np.int32)

    bounds = np.append(start_idx, len(keys))
    for ti in range(t):
        lo, hi = bounds[ti], bounds[ti + 1]
        rbi = int(uniq[ti] // n_cb)
        cbi = int(uniq[ti] % n_cb)
        rows = r[lo:hi] - rbi * block
        cols = s[lo:hi] - cbi * block
        np.add.at(tiles[ti], (rows, cols), w[lo:hi])
        col_blk[ti] = cbi
        row_of[ti] = rbi
    # padding tiles: zero values, point at block 0 of the LAST row so the
    # sequential-accumulation kernel sees them after all real rows.
    if t_pad > t:
        row_of[t:] = n_rb - 1
        col_blk[t:] = 0

    row_ptr = np.zeros((n_rb + 1,), dtype=np.int32)
    counts = np.bincount(row_of[:t], minlength=n_rb)
    # padding tiles belong to the last row for pointer purposes
    counts[n_rb - 1] += t_pad - t
    row_ptr[1:] = np.cumsum(counts)

    return _finalize(tiles, col_blk, row_of, row_ptr)


def rcm_reorder(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Bandwidth-reducing node relabeling for tile packing.

    Returns ``(perm, inv)`` with ``perm[new_id] = old_id``.  Relabel edges
    as ``(inv[senders], inv[receivers])`` and node payloads as
    ``feat[perm]`` before :func:`bcsr_from_coo`; the reduced matrix
    bandwidth bounds how many column blocks each row block touches, so
    real graphs (BA motifs, Enron, PPI) pack dense tiles instead of
    scattering one edge per tile.  Native C++ RCM with NumPy fallback.
    """
    from tpugraph import native

    indptr, indices, _ = native.coo_to_csr(
        np.asarray(receivers, dtype=np.int32),
        np.asarray(senders, dtype=np.int32),
        num_nodes,
    )
    perm = native.rcm_order(indptr, indices)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return perm, inv


def bcsr_transpose_host(
    senders: np.ndarray,
    receivers: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    pad_tiles_to: Optional[int] = None,
    tile_dtype=None,
    pad_rows_to: Optional[int] = None,
    device: bool = True,
) -> BCSR:
    """BCSR of A^T (for the backward pass dX = A^T @ dY).  For symmetric
    graph adjacencies A^T == A, but masked/attention weights break
    symmetry in general."""
    return bcsr_from_coo(
        receivers, senders, weights, num_nodes, block, pad_tiles_to,
        tile_dtype=tile_dtype, pad_rows_to=pad_rows_to, device=device,
    )


def _pad_rows_layout(row_ptr: np.ndarray, row_of: np.ndarray,
                     col_blk: np.ndarray, k_pack: int):
    """Vectorized host-side layout for row padding: returns
    ``(dst, new_col, new_row, new_ptr, t_new)`` where ``dst[i]`` is the
    destination slot of existing tile ``i``.  Dead slots keep col 0 /
    zero values.  Empty row blocks get one ``k_pack`` group of dead tiles
    so the kernel still zeroes their output."""
    n_blocks = len(row_ptr) - 1
    t_old = int(row_ptr[-1])
    counts = np.diff(row_ptr)
    new_counts = ((counts + k_pack - 1) // k_pack) * k_pack
    new_counts = np.where(new_counts == 0, k_pack, new_counts)
    t_new = int(new_counts.sum())
    new_ptr = np.zeros(n_blocks + 1, dtype=np.int32)
    new_ptr[1:] = np.cumsum(new_counts)
    ro = row_of[:t_old]
    dst = (new_ptr[ro] + (np.arange(t_old) - row_ptr[ro])).astype(np.int64)
    new_col = np.zeros(t_new, dtype=np.int32)
    new_col[dst] = col_blk[:t_old]
    new_row = np.repeat(np.arange(n_blocks, dtype=np.int32), new_counts)
    return dst, new_col, new_row, new_ptr, t_new


def bcsr_pad_tiles(m: BCSR, t_pad: int) -> BCSR:
    """Append dead tiles (zero values, col 0, last row block) so
    ``num_tiles == t_pad`` — used to equalize tile counts across stacked
    per-device BCSRs (halo path).  Host-side arrays preferred."""
    t = m.num_tiles
    if t_pad < t:
        raise ValueError(f"tile budget too small: {t} > {t_pad}")
    if t_pad == t:
        return m
    extra = t_pad - t
    b = m.block
    n_rb = m.num_row_blocks
    tiles = np.concatenate(
        [np.asarray(m.tiles),
         np.zeros((extra, b, b), dtype=np.asarray(m.tiles).dtype)]
    )
    col_blk = np.concatenate(
        [np.asarray(m.col_blk), np.zeros(extra, np.int32)]
    )
    row_of = np.concatenate(
        [np.asarray(m.row_of),
         np.full(extra, n_rb - 1, np.int32)]
    )
    row_ptr = np.asarray(m.row_ptr).copy()
    row_ptr[n_rb] += extra
    return BCSR(
        tiles=jnp.asarray(tiles),
        col_blk=jnp.asarray(col_blk),
        row_ptr=jnp.asarray(row_ptr),
        row_of=jnp.asarray(row_of),
        num_nodes=m.num_nodes,
        block=m.block,
    )


def coo_tile_counts(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    block: int = 128,
    weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-row-block tile counts of the BCSR that :func:`bcsr_from_coo`
    would build — WITHOUT materializing any tiles.  Lets callers pick a
    ``k_pack`` (:func:`choose_k_pack_counts`) before packing, so the pad
    happens inside :func:`bcsr_from_coo` on the host instead of as a
    multi-GB post-hoc device scatter.

    Pass ``weights`` when the edge list carries zero-weight padding
    edges (``core.graph`` convention): :func:`bcsr_from_coo` drops them
    before packing, so counting them here would include phantom tiles
    (typically pointing at node 0) that the packer discards."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    if weights is not None:
        live = np.asarray(weights) != 0
        s, r = s[live], r[live]
    n_pad = ((num_nodes + block - 1) // block) * block
    n_blocks = n_pad // block
    keys = (r.astype(np.int64) // block) * n_blocks + s // block
    uniq = np.unique(keys)
    return np.bincount((uniq // n_blocks).astype(np.int64),
                       minlength=n_blocks)


def choose_k_pack_counts(cnt: np.ndarray, max_overhead: float = 1.2) -> int:
    """:func:`choose_k_pack` on raw per-row-block tile counts (e.g. from
    :func:`coo_tile_counts`)."""
    cnt = np.asarray(cnt)
    pos = cnt[cnt > 0]
    if not pos.size:
        return 1
    kp = int(np.clip(np.median(pos), 1, 8))
    if kp < 2:
        return 1
    padded = int(np.where(cnt == 0, kp, ((cnt + kp - 1) // kp) * kp).sum())
    if padded > max_overhead * max(int(cnt.sum()), 1):
        return 1
    return kp


def choose_k_pack(m: BCSR, max_overhead: float = 1.2) -> int:
    """Pick a k_pack for the packed double-buffered SpMM kernel: the
    typical (median) row-block tile count, clipped to [1, 8], if padding
    every row to that multiple costs less than ``max_overhead`` dead
    tiles.  Returns 1 when packing isn't worth it.  Host-side arithmetic
    only — call :func:`bcsr_pad_rows` with the result before using
    ``k_pack`` in ``bcsr_matvec``/``spmm_bcsr_packed``."""
    return choose_k_pack_counts(np.diff(np.asarray(m.row_ptr)),
                                max_overhead)


def bcsr_pad_rows(m: BCSR, k_pack: int) -> BCSR:
    """Pad each row block's tile list with dead tiles (zero values,
    col 0) so every row's count is a multiple of ``k_pack`` — required by
    the packed SpMM kernel, which assumes one output row per grid step."""
    b = m.block
    dst, new_col, new_row, new_ptr, t_new = _pad_rows_layout(
        np.asarray(m.row_ptr), np.asarray(m.row_of),
        np.asarray(m.col_blk), k_pack,
    )
    # tiles scatter runs wherever the tiles live: numpy stays numpy;
    # device arrays scatter on device (a multi-GB host round trip through
    # the transfer tunnel was measured at ~190 s for a 20k-tile powerlaw
    # BCSR — prefer bcsr_from_coo(pad_rows_to=...) to avoid even the
    # eager-scatter compile).
    if isinstance(m.tiles, np.ndarray):
        new_tiles = np.zeros((t_new, b, b), dtype=m.tiles.dtype)
        new_tiles[dst] = m.tiles[: len(dst)]
        new_tiles = jnp.asarray(new_tiles)
    else:
        new_tiles = (
            jnp.zeros((t_new, b, b), dtype=m.tiles.dtype)
            .at[jnp.asarray(dst)]
            .set(m.tiles[: len(dst)])
        )
    return BCSR(
        tiles=new_tiles,
        col_blk=jnp.asarray(new_col),
        row_ptr=jnp.asarray(new_ptr),
        row_of=jnp.asarray(new_row),
        num_nodes=m.num_nodes,
        block=b,
    )


@dataclasses.dataclass
class BCSRTranspose:
    """Structure-only transpose plan for a BCSR matrix.

    Lets the backward pass of a *differentiable-weights* SpMM build the
    tiles of ``A^T`` on device as a cheap permute+transpose of the primal
    tiles — no host round trip, no second tile buffer kept resident:

        tiles_T[i] = tiles[perm[i]]^T * keep[i]

    ``keep`` zeroes entries that were injected to cover otherwise-empty
    row blocks of the transpose (the tile-walking kernel never writes an
    output block no tile visits).  Like :class:`BCSR`, arrays are pytree
    data and ``num_nodes``/``block`` are static.
    """

    col_blk: jax.Array  # int32[T']
    row_ptr: jax.Array  # int32[R+1]
    row_of: jax.Array   # int32[T']
    perm: jax.Array     # int32[T'] — source tile in the primal BCSR
    keep: jax.Array     # float32[T'] — 1 real, 0 injected dead tile
    num_nodes: int      # static
    block: int          # static

    @property
    def num_tiles(self) -> int:
        return self.perm.shape[0]


jax.tree_util.register_dataclass(
    BCSRTranspose,
    data_fields=["col_blk", "row_ptr", "row_of", "perm", "keep"],
    meta_fields=["num_nodes", "block"],
)


def transpose_tiles(tiles: jax.Array, tp: BCSRTranspose) -> jax.Array:
    """Materialize the tiles of ``A^T`` from the primal tiles (device op)."""
    return jnp.transpose(tiles[tp.perm], (0, 2, 1)) * tp.keep[:, None, None]


def bcsr_transpose_plan(m: BCSR) -> BCSRTranspose:
    """Host-side construction of the :class:`BCSRTranspose` plan.

    A tile of ``A`` at block coordinates (rb, cb) becomes a tile of
    ``A^T`` at (cb, rb); tiles are regrouped so each transpose row block's
    tiles are consecutive (the accumulation kernel's contract).  Row
    blocks of the transpose that no real tile covers get one injected
    dead tile (perm 0, keep 0) so their output is written as zero.

    Rectangular-aware: for ``m`` of shape [R, C] the plan describes a
    [C, R] transpose (row blocks = m's column blocks, ``num_nodes`` =
    m's row count) — the halo GAT path transposes [Ns, Ns+halo] BCSRs.
    """
    row = np.asarray(m.row_of)
    col = np.asarray(m.col_blk)
    tiles = np.asarray(m.tiles)
    n_blocks = m.num_nodes // m.block  # transpose rows = primal cols

    real = np.flatnonzero(np.any(tiles != 0, axis=(1, 2)))
    # transpose coordinates of real tiles; group by transpose row block
    t_row, t_col = col[real], row[real]
    order = np.lexsort((t_col, t_row))
    t_row, t_col, perm = t_row[order], t_col[order], real[order]
    keep = np.ones(len(perm), dtype=np.float32)

    covered = np.zeros(n_blocks, dtype=bool)
    covered[t_row] = True
    missing = np.flatnonzero(~covered)
    if missing.size:
        # appended groups are each contiguous in their own row block
        t_row = np.concatenate([t_row, missing.astype(t_row.dtype)])
        t_col = np.concatenate([t_col, np.zeros(missing.size, t_col.dtype)])
        perm = np.concatenate([perm, np.zeros(missing.size, perm.dtype)])
        keep = np.concatenate([keep, np.zeros(missing.size, np.float32)])

    counts = np.bincount(t_row, minlength=n_blocks)
    row_ptr = np.zeros(n_blocks + 1, dtype=np.int32)
    row_ptr[1:] = np.cumsum(counts)
    return BCSRTranspose(
        col_blk=jnp.asarray(t_col.astype(np.int32)),
        row_ptr=jnp.asarray(row_ptr),
        row_of=jnp.asarray(t_row.astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        keep=jnp.asarray(keep),
        num_nodes=m.num_row_nodes,  # transpose cols = primal rows
        block=m.block,
    )


def bcsr_sym_partner(m: BCSR) -> np.ndarray:
    """For each tile at block (rb, cb), the index of the tile at (cb, rb).

    Used to symmetrize tile-space mask logits, ``(L + L_partner^T) / 2`` —
    the block-sparse analog of the reference's dense ``(M + M^T) / 2``
    (``explainer/explain.py:665-678``).  Undirected adjacencies have a
    symmetric tile pattern so a partner always exists for real tiles;
    tiles without one (injected padding) partner with themselves, which
    is harmless because their base weights are zero.
    """
    row = np.asarray(m.row_of)
    col = np.asarray(m.col_blk)
    at = {}
    for t in range(len(row)):
        at.setdefault((int(row[t]), int(col[t])), t)
    partner = np.array(
        [at.get((int(col[t]), int(row[t])), t) for t in range(len(row))],
        dtype=np.int32,
    )
    return partner


def bcsr_to_dense(m: BCSR) -> np.ndarray:
    """Densify (testing only).  Shape [rows, cols] (rect-aware)."""
    b = m.block
    out = np.zeros((m.num_row_nodes, m.num_nodes), dtype=np.float32)
    tiles = np.asarray(m.tiles)
    col = np.asarray(m.col_blk)
    row = np.asarray(m.row_of)
    for ti in range(m.num_tiles):
        ri, ci = int(row[ti]) * b, int(col[ti]) * b
        out[ri : ri + b, ci : ci + b] += tiles[ti]
    return out
