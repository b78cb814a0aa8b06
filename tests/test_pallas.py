"""Pallas BCSR kernel tests (interpreter mode on CPU; the same code
compiles to MXU kernels on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_to_dense, bcsr_transpose_host
from tpugraph.ops.pallas_spmm import make_bcsr_matvec, sddmm_bcsr, spmm_bcsr


def random_coo(rng, n=300, p=0.02):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    s, r = np.nonzero(a)
    w = rng.random(len(s)).astype(np.float32)
    # symmetrize weights
    dense = np.zeros((n, n), np.float32)
    dense[r, s] = w
    dense = (dense + dense.T) / 2
    w = dense[r, s]
    return s.astype(np.int32), r.astype(np.int32), w, dense, n


def test_bcsr_roundtrip(rng):
    s, r, w, dense, n = random_coo(rng)
    m = bcsr_from_coo(s, r, w, n)
    back = bcsr_to_dense(m)[:n, :n]
    np.testing.assert_allclose(back, dense, atol=1e-6)


def test_spmm_bcsr_matches_dense(rng):
    s, r, w, dense, n = random_coo(rng)
    m = bcsr_from_coo(s, r, w, n)
    d = 128
    x = rng.standard_normal((m.num_nodes, d)).astype(np.float32)
    y = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    expected = dense @ x[:n]
    np.testing.assert_allclose(y[:n], expected, atol=1e-3)
    # padded rows produce zeros
    np.testing.assert_allclose(y[n:], 0.0, atol=1e-6)


def test_spmm_bcsr_padded_tiles(rng):
    s, r, w, dense, n = random_coo(rng, n=150)
    m = bcsr_from_coo(s, r, w, n, pad_tiles_to=32)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y[:n], dense @ x[:n], atol=1e-3)


def test_sddmm_bcsr_matches_dense(rng):
    s, r, w, dense, n = random_coo(rng, n=200)
    m = bcsr_from_coo(s, r, w, n)
    np_pad = m.num_nodes
    dy = rng.standard_normal((np_pad, 128)).astype(np.float32)
    x = rng.standard_normal((np_pad, 128)).astype(np.float32)
    tiles_grad = np.asarray(sddmm_bcsr(m, jnp.asarray(dy), jnp.asarray(x),
                                       interpret=True))
    # check per-tile against dense dY @ X^T on support
    full = dy @ x.T
    support = bcsr_to_dense(m) != 0
    expected_dense = full * support
    got = np.zeros_like(expected_dense)
    col = np.asarray(m.col_blk)
    row = np.asarray(m.row_of)
    b = m.block
    for t in range(m.num_tiles):
        got[row[t] * b : (row[t] + 1) * b, col[t] * b : (col[t] + 1) * b] += (
            tiles_grad[t]
        )
    np.testing.assert_allclose(got, expected_dense, atol=1e-3)


def test_custom_vjp_gradient(rng):
    s, r, w, dense, n = random_coo(rng, n=120)
    m = bcsr_from_coo(s, r, w, n)
    m_t = bcsr_transpose_host(s, r, w, n)
    matvec = make_bcsr_matvec(m, m_t, interpret=True)
    x = jnp.asarray(rng.standard_normal((m.num_nodes, 128)).astype(np.float32))

    def loss(x):
        y = matvec(x)
        return jnp.sum(y**2)

    g = np.asarray(jax.grad(loss)(x))
    # reference gradient: 2 A^T A x
    expected = 2 * dense.T @ (dense @ np.asarray(x)[:n])
    np.testing.assert_allclose(g[:n], expected, rtol=2e-3, atol=1e-2)


def test_spmm_empty_row_block(rng):
    # nodes 128..255 form an isolated block with no edges: the kernel must
    # still zero-initialize that output block
    n = 384
    s = np.array([0, 1, 300, 301], np.int32)
    r = np.array([1, 0, 301, 300], np.int32)
    w = np.ones(4, np.float32)
    from tpugraph.ops.bcsr import bcsr_from_coo

    m = bcsr_from_coo(s, r, w, n)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y[128:256], 0.0)
    np.testing.assert_allclose(y[0], x[1], atol=1e-4)


def test_spmm_packed_matches_v1(rng):
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_pad_rows
    from tpugraph.ops.pallas_spmm import spmm_bcsr_packed

    s, r, w, dense, n = random_coo(rng, n=400, p=0.03)
    m = bcsr_from_coo(s, r, w, n)
    mp = bcsr_pad_rows(m, 4)
    assert mp.num_tiles % 4 == 0
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y1 = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    y2 = np.asarray(spmm_bcsr_packed(mp, jnp.asarray(x), k_pack=4,
                                     interpret=True))
    np.testing.assert_allclose(y2, y1, atol=1e-3)
    np.testing.assert_allclose(y2[:n], dense @ x[:n], atol=1e-3)


def test_graphconv_bcsr_path_matches_dense(rng):
    """The full encoder forward+backward on the BCSR fast path matches
    the dense oracle."""
    import jax
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import BCSRAdj
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host

    s, r, w, dense, n = random_coo(rng, n=100, p=0.05)
    m = bcsr_from_coo(s, r, w, n)
    m_t = bcsr_transpose_host(s, r, w, n)
    model = GcnEncoderNode(input_dim=7, hidden_dim=12, embedding_dim=12,
                           label_dim=3, num_layers=3)
    x = rng.standard_normal((n, 7)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[None]),
                        jnp.asarray(dense[None]))
    pred_dense, _ = model.apply(params, jnp.asarray(x[None]),
                                jnp.asarray(dense[None]))
    x_pad = np.zeros((m.num_nodes, 7), np.float32)
    x_pad[:n] = x
    pred_bcsr, _ = model.apply(params, jnp.asarray(x_pad),
                               BCSRAdj(m, m_t))
    np.testing.assert_allclose(np.asarray(pred_bcsr)[:n],
                               np.asarray(pred_dense)[0], atol=1e-3)

    # gradient flows through the custom vjp
    def loss(p):
        out, _ = model.apply(p, jnp.asarray(x_pad), BCSRAdj(m, m_t))
        return jnp.sum(out[:n] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def test_bcsr_transpose_plan(rng):
    from tpugraph.ops.bcsr import bcsr_transpose_plan, transpose_tiles

    s, r, w, dense, n = random_coo(rng, n=300, p=0.02)
    # break symmetry of VALUES (support stays symmetric)
    w2 = rng.random(len(s)).astype(np.float32)
    m = bcsr_from_coo(s, r, w2, n)
    tp = bcsr_transpose_plan(m)
    t_tiles = np.asarray(transpose_tiles(m.tiles, tp))
    got = np.zeros((m.num_nodes, m.num_nodes), np.float32)
    b = m.block
    row = np.asarray(tp.row_of)
    col = np.asarray(tp.col_blk)
    for t in range(tp.num_tiles):
        got[row[t] * b:(row[t] + 1) * b, col[t] * b:(col[t] + 1) * b] += t_tiles[t]
    np.testing.assert_allclose(got, bcsr_to_dense(m).T, atol=1e-6)


def test_bcsr_matvec_dw_tile_gradient(rng):
    """Gradients flow into the tile VALUES and match the dense oracle."""
    from tpugraph.ops.bcsr import bcsr_transpose_plan
    from tpugraph.ops.pallas_spmm import bcsr_matvec_dw

    s, r, w, dense, n = random_coo(rng, n=140)
    m = bcsr_from_coo(s, r, w, n)
    tp = bcsr_transpose_plan(m)
    x = jnp.asarray(rng.standard_normal((m.num_nodes, 128)).astype(np.float32))
    g_out = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)

    def loss(tiles, xx):
        import dataclasses
        mm = dataclasses.replace(m, tiles=tiles)
        y = bcsr_matvec_dw(mm, tp, xx, interpret=True)
        return jnp.sum(y * jnp.asarray(g_out))

    dtiles, dx = jax.grad(loss, argnums=(0, 1))(m.tiles, x)
    # dense oracle: dW = g @ x^T on support; dx = W^T @ g
    W = bcsr_to_dense(m)
    dW = (g_out @ np.asarray(x).T) * (W != 0)
    got = np.zeros_like(W)
    b = m.block
    row, col = np.asarray(m.row_of), np.asarray(m.col_blk)
    dt = np.asarray(dtiles)
    for t in range(m.num_tiles):
        got[row[t] * b:(row[t] + 1) * b, col[t] * b:(col[t] + 1) * b] += dt[t]
    np.testing.assert_allclose(got, dW, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dx), W.T @ g_out, atol=1e-2)


def test_sddmm_dw_gradients(rng):
    from tpugraph.ops.bcsr import bcsr_transpose_plan
    from tpugraph.ops.pallas_spmm import sddmm_dw

    s, r, w, dense, n = random_coo(rng, n=140)
    m = bcsr_from_coo(s, r, w, n)
    tp = bcsr_transpose_plan(m)
    a = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    bb = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    g_sc = rng.standard_normal((m.num_tiles, m.block, m.block)).astype(np.float32)

    def loss(aa, xx):
        sc = sddmm_dw(m, tp, aa, xx, interpret=True)
        return jnp.sum(sc * jnp.asarray(g_sc))

    da, db = jax.grad(loss, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(bb))
    # dense oracle: S = (a b^T) * support; da = (G*support) @ b, db = (G*support)^T @ a
    support = bcsr_to_dense(m) != 0
    G = np.zeros(support.shape, np.float32)
    blk = m.block
    row, col = np.asarray(m.row_of), np.asarray(m.col_blk)
    for t in range(m.num_tiles):
        G[row[t] * blk:(row[t] + 1) * blk, col[t] * blk:(col[t] + 1) * blk] += g_sc[t]
    G = G * support
    np.testing.assert_allclose(np.asarray(da), G @ bb, atol=1e-2)
    np.testing.assert_allclose(np.asarray(db), G.T @ a, atol=1e-2)


def test_gat_bcsr_matches_sparse(rng):
    """GAT attention on the BCSR path == the SparseAdj SDDMM path."""
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn.layers import BCSRAdj, GraphConv, SparseAdj
    from tpugraph.ops.bcsr import bcsr_transpose_plan

    s, r, w, dense, n = random_coo(rng, n=100, p=0.05)
    m = bcsr_from_coo(s, r, w, n)
    tp = bcsr_transpose_plan(m)
    g = graph_from_edges(s, r, n, edge_weight=w,
                         num_nodes_padded=m.num_nodes)
    layer = GraphConv(input_dim=7, output_dim=5, att=True)
    x = rng.standard_normal((m.num_nodes, 7)).astype(np.float32)
    x = x * (np.arange(m.num_nodes) < n)[:, None]
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        SparseAdj(g.senders, g.receivers, g.edge_weight))
    y_coo, _ = layer.apply(params, jnp.asarray(x),
                           SparseAdj(g.senders, g.receivers, g.edge_weight))
    y_bcsr, _ = layer.apply(params, jnp.asarray(x), BCSRAdj(m, tp=tp))
    np.testing.assert_allclose(np.asarray(y_bcsr)[:n], np.asarray(y_coo)[:n],
                               atol=1e-3)

    def loss(p):
        y, _ = layer.apply(p, jnp.asarray(x), BCSRAdj(m, tp=tp))
        return jnp.sum(y[:n] ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    att_g = grads["params"]["att_weight"]
    assert float(jnp.sum(jnp.abs(att_g))) > 0


@pytest.mark.parametrize("block", [128, 256])
def test_spmm_bf16_and_blocks(rng, block):
    import dataclasses
    from tpugraph.ops.bcsr import bcsr_from_coo

    s, r, w, dense, n = random_coo(rng, n=300, p=0.02)
    m = bcsr_from_coo(s, r, w, n, block=block)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y32 = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y32[:n], dense @ x[:n], atol=1e-3)
    mb = dataclasses.replace(m, tiles=m.tiles.astype(jnp.bfloat16))
    y16 = np.asarray(spmm_bcsr(mb, jnp.asarray(x), interpret=True))
    # bf16 tiles: ~1e-2 relative accuracy
    scale = np.abs(dense @ x[:n]).max() + 1e-9
    assert np.abs(y16[:n] - dense @ x[:n]).max() / scale < 5e-2


def test_spmm_packed_bf16_x(rng):
    """Packed kernel with bf16 x and bf16 tiles (manual-DMA scratch must
    match the HBM source dtype — was hardcoded f32)."""
    import dataclasses
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_pad_rows
    from tpugraph.ops.pallas_spmm import spmm_bcsr_packed

    s, r, w, dense, n = random_coo(rng, n=300, p=0.03)
    m = bcsr_pad_rows(bcsr_from_coo(s, r, w, n), 2)
    m16 = dataclasses.replace(m, tiles=m.tiles.astype(jnp.bfloat16))
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm_bcsr_packed(m16, jnp.asarray(x).astype(jnp.bfloat16),
                                    k_pack=2, interpret=True))
    expected = dense @ x[:n]
    scale = np.abs(expected).max() + 1e-9
    assert np.abs(y[:n] - expected).max() / scale < 5e-2


def test_bcsr_matvec_dw_pair_matches_dw(rng):
    """Explicit-transpose variant gives identical grads to the plan-based
    one (it skips the per-layer transpose, not any math)."""
    import dataclasses
    from tpugraph.ops.bcsr import bcsr_transpose_plan, transpose_tiles
    from tpugraph.ops.pallas_spmm import bcsr_matvec_dw, bcsr_matvec_dw_pair
    from tpugraph.ops.bcsr import BCSR

    s, r, w, dense, n = random_coo(rng, n=140)
    m = bcsr_from_coo(s, r, w, n)
    tp = bcsr_transpose_plan(m)
    x = jnp.asarray(rng.standard_normal((m.num_nodes, 128)).astype(np.float32))
    g_out = jnp.asarray(rng.standard_normal((m.num_nodes, 128)).astype(np.float32))

    def loss_dw(tiles, xx):
        mm = dataclasses.replace(m, tiles=tiles)
        return jnp.sum(bcsr_matvec_dw(mm, tp, xx, interpret=True) * g_out)

    def loss_pair(tiles, xx):
        mm = dataclasses.replace(m, tiles=tiles)
        mt = BCSR(tiles=transpose_tiles(tiles, tp), col_blk=tp.col_blk,
                  row_ptr=tp.row_ptr, row_of=tp.row_of,
                  num_nodes=tp.num_nodes, block=tp.block)
        return jnp.sum(bcsr_matvec_dw_pair(mm, mt, xx, interpret=True) * g_out)

    d1 = jax.grad(loss_dw, argnums=(0, 1))(m.tiles, x)
    d2 = jax.grad(loss_pair, argnums=(0, 1))(m.tiles, x)
    np.testing.assert_allclose(np.asarray(d2[0]), np.asarray(d1[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2[1]), np.asarray(d1[1]), atol=1e-4)


def test_bcsr_matvec_packed_static_path(rng):
    """bcsr_matvec(k_pack=...) routes both directions through the packed
    kernel; fwd and grads match the per-tile path."""
    from tpugraph.ops.bcsr import bcsr_pad_rows, choose_k_pack
    from tpugraph.ops.pallas_spmm import bcsr_matvec

    s, r, w, dense, n = random_coo(rng, n=300, p=0.03)
    m = bcsr_from_coo(s, r, w, n)
    m_t = bcsr_transpose_host(s, r, w, n)
    kp = 2
    mp, mtp = bcsr_pad_rows(m, kp), bcsr_pad_rows(m_t, kp)
    x = jnp.asarray(rng.standard_normal((m.num_nodes, 128)).astype(np.float32))

    def loss(fn):
        return lambda xx: jnp.sum(fn(xx) ** 2)

    y1 = bcsr_matvec(m, m_t, x, interpret=True)
    y2 = bcsr_matvec(mp, mtp, x, interpret=True, k_pack=kp)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-3)
    g1 = jax.grad(loss(lambda xx: bcsr_matvec(m, m_t, xx, interpret=True)))(x)
    g2 = jax.grad(loss(lambda xx: bcsr_matvec(mp, mtp, xx, interpret=True,
                                              k_pack=kp)))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-2)
    # choose_k_pack returns a sane value on this graph
    assert choose_k_pack(m) >= 1


def test_spmm_bf16_out_dtype(rng):
    """out_dtype=bf16: f32 VMEM accumulation, one downcast store per row
    block.  Values match the f32 kernel to bf16 rounding; empty row
    blocks still come out zero."""
    s, r, w, dense, n = random_coo(rng, n=300, p=0.03)
    m = bcsr_from_coo(s, r, w, n)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y32 = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    y16 = spmm_bcsr(m, jnp.asarray(x), interpret=True,
                    out_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.bfloat16
    scale = np.abs(y32).max() + 1e-9
    assert np.abs(np.asarray(y16, np.float32) - y32).max() / scale < 2e-2

    # isolated empty row block (nodes 128..255)
    s2 = np.array([0, 1, 300, 301], np.int32)
    r2 = np.array([1, 0, 301, 300], np.int32)
    m2 = bcsr_from_coo(s2, r2, np.ones(4, np.float32), 384)
    x2 = rng.standard_normal((m2.num_nodes, 128)).astype(np.float32)
    y2 = np.asarray(
        spmm_bcsr(m2, jnp.asarray(x2), interpret=True,
                  out_dtype=jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_allclose(y2[128:256], 0.0)


def test_spmm_packed_bf16_out_dtype(rng):
    """Packed kernel bf16-everything chain (bf16 tiles, bf16 x DMA, bf16
    output) matches the dense oracle within bf16 tolerance."""
    import dataclasses
    from tpugraph.ops.bcsr import bcsr_pad_rows
    from tpugraph.ops.pallas_spmm import spmm_bcsr_packed

    s, r, w, dense, n = random_coo(rng, n=300, p=0.03)
    m = bcsr_pad_rows(bcsr_from_coo(s, r, w, n), 2)
    m16 = dataclasses.replace(m, tiles=m.tiles.astype(jnp.bfloat16))
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y = spmm_bcsr_packed(
        m16, jnp.asarray(x).astype(jnp.bfloat16), k_pack=2,
        interpret=True, out_dtype=jnp.bfloat16,
    )
    assert y.dtype == jnp.bfloat16
    expected = dense @ x[:n]
    scale = np.abs(expected).max() + 1e-9
    err = np.abs(np.asarray(y, np.float32)[:n] - expected).max() / scale
    assert err < 5e-2, err


def test_bcsr_pad_at_pack_time(rng):
    """bcsr_from_coo(pad_rows_to=k) ≡ bcsr_pad_rows(bcsr_from_coo(), k)
    (host-side pad, no device scatter), and coo_tile_counts matches the
    packed row_ptr."""
    from tpugraph.ops.bcsr import (
        bcsr_pad_rows,
        bcsr_to_dense,
        choose_k_pack_counts,
        coo_tile_counts,
    )

    s, r, w, dense, n = random_coo(rng, n=400, p=0.03)
    m = bcsr_from_coo(s, r, w, n)
    cnt = coo_tile_counts(s, r, n)
    np.testing.assert_array_equal(cnt, np.diff(np.asarray(m.row_ptr)))
    kp = max(choose_k_pack_counts(cnt), 2)

    a = bcsr_pad_rows(m, kp)
    b = bcsr_from_coo(s, r, w, n, pad_rows_to=kp)
    assert a.num_tiles == b.num_tiles and b.num_tiles % kp == 0
    np.testing.assert_array_equal(np.asarray(a.row_ptr), np.asarray(b.row_ptr))
    np.testing.assert_array_equal(np.asarray(a.row_of), np.asarray(b.row_of))
    np.testing.assert_array_equal(np.asarray(a.col_blk), np.asarray(b.col_blk))
    np.testing.assert_allclose(np.asarray(a.tiles), np.asarray(b.tiles))
    np.testing.assert_allclose(bcsr_to_dense(b)[:n, :n], dense, atol=1e-6)

    # bf16 host cast at pack time
    b16 = bcsr_from_coo(s, r, w, n, pad_rows_to=kp,
                        tile_dtype=jnp.bfloat16)
    assert b16.tiles.dtype == jnp.bfloat16



def test_spmm_int8_tiles(rng):
    """int8 tiles (exact for unit/integer weights — the rank-1 degree
    normalization factors into x/y scalings) match dense on both
    kernels."""
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_to_dense

    n, e = 500, 4000
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = np.ones(e, np.float32)
    m = bcsr_from_coo(s, r, w, n, block=128, tile_dtype=jnp.int8,
                      pad_rows_to=4)
    assert m.tiles.dtype == jnp.int8
    dense = np.zeros((m.num_nodes, m.num_nodes), np.float32)
    np.add.at(dense, (r, s), w)
    np.testing.assert_allclose(bcsr_to_dense(m), dense)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    ref = dense @ x
    y = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, ref, rtol=5e-3, atol=5e-2)
    from tpugraph.ops.pallas_spmm import spmm_bcsr_packed

    y2 = np.asarray(spmm_bcsr_packed(m, jnp.asarray(x), k_pack=4,
                                     interpret=True))
    np.testing.assert_allclose(y2, ref, rtol=5e-3, atol=5e-2)
