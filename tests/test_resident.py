"""Tests for the VMEM-resident column-stacked SpMM kernel
(`tpugraph/ops/pallas_resident.py`), interpret mode on CPU.

Parity oracle: densified BCSR matmul (the reference computes the same
aggregation densely, models.py:70).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_to_dense
from tpugraph.ops.pallas_resident import (
    BCSRStacked,
    resident_fits,
    spmm_stacked_resident,
    stack_bcsr,
    stacked_matvec,
)


def _random_graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = np.ones(e, np.float32)
    return s, r, w


@pytest.mark.parametrize("stack", [1, 2, 4])
@pytest.mark.parametrize("dt", [None, jnp.bfloat16, jnp.int8])
def test_resident_matches_dense(stack, dt):
    n, e, d = 1024, 4000, 128
    s, r, w = _random_graph(n, e)
    x = np.random.default_rng(1).standard_normal((n, d)).astype(np.float32)

    m_ref = bcsr_from_coo(s, r, w, n, block=256)
    ref = bcsr_to_dense(m_ref) @ x

    m = bcsr_from_coo(s, r, w, n, block=256, tile_dtype=dt, device=False)
    st = stack_bcsr(m, stack=stack, k_pack=4)
    assert st.num_tiles % 4 == 0
    xd = jnp.asarray(x, dtype=jnp.bfloat16 if dt == jnp.bfloat16 else None)
    y = np.asarray(spmm_stacked_resident(st, xd, k_pack=4, interpret=True))
    tol = 1e-5 if dt is None else 2e-2
    assert np.abs(y - ref).max() / np.abs(ref).max() < tol


def test_resident_bf16_out_matches_f32():
    """out_dtype=bfloat16 (persistent-scratch accumulate + one final
    downcast) matches the f32 output to bf16 rounding — the r4 +14%
    bench arrangement."""
    n, e, d = 1024, 4000, 128
    s, r, w = _random_graph(n, e)
    x = np.random.default_rng(1).standard_normal((n, d)).astype(np.float32)
    m = bcsr_from_coo(s, r, w, n, block=256, tile_dtype=jnp.int8,
                      device=False)
    st = stack_bcsr(m, stack=1, k_pack=4)
    xd = jnp.asarray(x, jnp.bfloat16)
    y32 = np.asarray(spmm_stacked_resident(st, xd, k_pack=4,
                                           interpret=True))
    y16 = spmm_stacked_resident(st, xd, k_pack=4, interpret=True,
                                out_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), y32,
        atol=np.abs(y32).max() * 8e-3,
    )


def test_stack_drops_dead_padding_tiles():
    """pad_rows_to dead tiles in the source BCSR must not survive into
    the stacked layout (they would dilute the stacks)."""
    n, e = 1024, 2000
    s, r, w = _random_graph(n, e, seed=3)
    m_plain = bcsr_from_coo(s, r, w, n, block=256, device=False)
    m_padded = bcsr_from_coo(s, r, w, n, block=256, pad_rows_to=4,
                             device=False)
    st_a = stack_bcsr(m_plain, stack=2, k_pack=2)
    st_b = stack_bcsr(m_padded, stack=2, k_pack=2)
    assert st_a.num_tiles == st_b.num_tiles
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 128)).astype(np.float32)
    )
    ya = spmm_stacked_resident(st_a, x, k_pack=2, interpret=True)
    yb = spmm_stacked_resident(st_b, x, k_pack=2, interpret=True)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6)


def test_stack_odd_column_groups():
    """A column block with an odd tile count pads its last stack with a
    zero half that must contribute nothing."""
    n = 768  # 3 row blocks of 256 -> column groups of size 3 (odd)
    block = 256
    rng = np.random.default_rng(5)
    # one edge in every (rb, cb) pair -> every column group has 3 tiles
    rb, cb = np.meshgrid(np.arange(3), np.arange(3))
    s = (cb.ravel() * block + rng.integers(0, block, 9)).astype(np.int32)
    r = (rb.ravel() * block + rng.integers(0, block, 9)).astype(np.int32)
    w = np.ones(9, np.float32)
    m = bcsr_from_coo(s, r, w, n, block=block, device=False)
    st = stack_bcsr(m, stack=2, k_pack=1)
    assert st.num_tiles == 6  # ceil(3/2) * 3 columns
    x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    y = spmm_stacked_resident(st, x, k_pack=1, interpret=True)
    ref = bcsr_to_dense(m) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_empty_graph():
    m = bcsr_from_coo(
        np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.float32),
        512, block=256, device=False,
    )
    st = stack_bcsr(m, stack=2, k_pack=4)
    x = jnp.ones((512, 128), jnp.float32)
    y = spmm_stacked_resident(st, x, k_pack=4, interpret=True)
    assert float(jnp.abs(y).sum()) == 0.0


def test_resident_fits_budget():
    assert resident_fits(65536, 65536, 128, 2)          # the bench shape
    assert not resident_fits(1_000_000, 1_000_000, 128, 2)


def test_stacked_matvec_grad_matches_dense():
    """Custom-VJP wrapper: dx must equal the dense A^T @ g."""
    n, e, d = 512, 1500, 128
    s, r, w = _random_graph(n, e, seed=7)
    m = bcsr_from_coo(s, r, w, n, block=256, device=False)
    m_t = bcsr_from_coo(r, s, w, n, block=256, device=False)
    st = stack_bcsr(m, stack=2, k_pack=2)
    st_t = stack_bcsr(m_t, stack=2, k_pack=2)
    dense = bcsr_to_dense(m)
    x = np.random.default_rng(2).standard_normal((n, d)).astype(np.float32)

    def loss(xv):
        y = stacked_matvec(st, st_t, xv, interpret=True, k_pack=2)
        return jnp.sum(y * y)

    g = jax.grad(loss)(jnp.asarray(x))
    y_ref = dense @ x
    g_ref = 2.0 * dense.T @ y_ref
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-4, atol=2e-4)


def test_stacked_pytree_roundtrip():
    n, e = 512, 800
    s, r, w = _random_graph(n, e, seed=9)
    m = bcsr_from_coo(s, r, w, n, block=256, device=False)
    st = stack_bcsr(m, stack=2, k_pack=2)
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(st2, BCSRStacked)
    assert st2.stack == 2 and st2.block == 256


def test_int4_packed_matches_dense():
    n, e, d = 1024, 4000, 128
    s, r, w = _random_graph(n, e, seed=11)
    m_ref = bcsr_from_coo(s, r, w, n, block=256)
    x = np.random.default_rng(4).standard_normal((n, d)).astype(np.float32)
    ref = bcsr_to_dense(m_ref) @ x

    m = bcsr_from_coo(s, r, w, n, block=256, tile_dtype=jnp.int8,
                      device=False)
    from tpugraph.ops.pallas_resident import pack_stacked_int4
    st = pack_stacked_int4(stack_bcsr(m, stack=2, k_pack=4))
    assert st.packed4 and st.tiles.shape[-1] == 128
    y = np.asarray(spmm_stacked_resident(st, jnp.asarray(x), k_pack=4,
                                         interpret=True))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-2


def test_int4_rejects_out_of_range():
    n = 512
    s = np.array([0, 1], np.int32)
    r = np.array([1, 0], np.int32)
    w = np.array([20.0, 1.0], np.float32)  # 20 > 15
    m = bcsr_from_coo(s, r, w, n, block=256, device=False)
    from tpugraph.ops.pallas_resident import pack_stacked_int4
    st = stack_bcsr(m, stack=2, k_pack=1)
    with pytest.raises(ValueError):
        pack_stacked_int4(st)


def test_spmm_pair_resident_matches_two_call_and_dense(rng):
    """Fused A_t(A x) pair kernel (ONE pallas_call; VERDICT r4 item 3)
    matches the two-call resident path and the dense oracle, including
    a non-symmetric adjacency and rectangular row/col padding."""
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
    from tpugraph.ops.pallas_resident import (
        pack_pair,
        spmm_pair_resident,
        spmm_stacked_resident,
        stack_bcsr,
    )

    n, b, d, kp = 64, 8, 128, 4
    a = (rng.random((n, n)) < 0.15).astype(np.float32)  # NOT symmetric
    s, r = np.nonzero(a)
    w = np.ones(len(s), np.float32)
    m = bcsr_from_coo(s.astype(np.int32), r.astype(np.int32), w, n,
                      block=b, tile_dtype=jnp.int8, device=False)
    m_t = bcsr_transpose_host(s.astype(np.int32), r.astype(np.int32), w,
                              n, block=b, tile_dtype=jnp.int8,
                              device=False)
    st, st_t = stack_bcsr(m, 1, kp), stack_bcsr(m_t, 1, kp)
    x = rng.standard_normal((st.num_nodes, d)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)

    pr = pack_pair(st, st_t)
    dx = spmm_pair_resident(pr, xb, k_pack=kp).astype(jnp.float32)
    # two-call reference with the same y-downcast dtype path
    y = spmm_stacked_resident(st, xb, k_pack=kp,
                              out_dtype=jnp.bfloat16)
    dx_ref = spmm_stacked_resident(st_t, y, k_pack=kp)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-2, atol=0.3)
    # f32 out variant matches too
    dx32 = spmm_pair_resident(pr, xb, k_pack=kp,
                              out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dx32), np.asarray(dx_ref),
                               rtol=2e-2, atol=1e-2)

    # dense oracle: the (senders, receivers) convention makes the
    # packed matrix A^T of `a`, so the pair computes a @ (a.T @ x)
    a_pad = np.zeros((st.num_row_nodes, st.num_nodes), np.float32)
    a_pad[:n, :n] = a
    xf = np.asarray(xb.astype(jnp.float32))
    dense = a_pad @ (a_pad.T @ xf)
    np.testing.assert_allclose(np.asarray(dx), dense, rtol=3e-2,
                               atol=0.5)


def test_spmm_power_resident_matches_repeated_pairs(rng):
    """(A_t A)^hops in one call == hops sequential pair applications
    (same bf16 rounding points), incl. the hop_scale factor."""
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
    from tpugraph.ops.pallas_resident import (
        pack_pair,
        spmm_pair_resident,
        spmm_power_resident,
        stack_bcsr,
    )

    n, b, d, kp = 64, 8, 128, 4
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    s, r = np.nonzero(a)
    w = np.ones(len(s), np.float32)
    m = bcsr_from_coo(s.astype(np.int32), r.astype(np.int32), w, n,
                      block=b, tile_dtype=jnp.int8, device=False)
    m_t = bcsr_transpose_host(s.astype(np.int32), r.astype(np.int32), w,
                              n, block=b, tile_dtype=jnp.int8,
                              device=False)
    pr = pack_pair(stack_bcsr(m, 1, kp), stack_bcsr(m_t, 1, kp))
    x = jnp.asarray(
        (rng.standard_normal((pr.num_nodes, d)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)

    scale = 0.125
    y3 = spmm_power_resident(pr, x, hops=3, k_pack=kp, hop_scale=scale)
    ref = x
    for _ in range(3):
        ref = spmm_pair_resident(pr, ref, k_pack=kp)
        ref = (ref.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y3.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)), rtol=3e-2, atol=1e-3,
    )


def test_diffuse_matches_dense_propagation(rng):
    """ops.diffusion.diffuse == dense (S^T S)^H x with the sym-normalized
    propagation matrix (SGC-style), through the fused power kernel."""
    from tpugraph.core.graph import graph_from_dense
    from tpugraph.ops.diffusion import DiffusionOperator, diffuse

    n, d, hops = 48, 128, 3
    a = (rng.random((n, n)) < 0.2).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    x = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)

    y = np.asarray(diffuse(g, jnp.asarray(x), hops, block=8).astype(
        jnp.float32))

    # dense oracle on the padded graph
    n_pad = g.num_nodes_padded
    a_pad = np.zeros((n_pad, n_pad), np.float32)
    a_pad[:n, :n] = a
    deg = a_pad.sum(1)
    inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    s_hat = a_pad * inv[:, None] * inv[None, :]
    x_pad = np.zeros((n_pad, d), np.float32)
    x_pad[:n] = x
    ref = x_pad
    for _ in range(hops):
        ref = s_hat.T @ (s_hat @ ref)
    # bf16 tiles + per-phase bf16 rounding: loose-ish tolerance
    np.testing.assert_allclose(y, ref[:n], rtol=6e-2, atol=2e-2)

    # un-normalized integer adjacency: hop_scale keeps powers bounded
    op = DiffusionOperator(g, block=8, normalize=False)
    x_p = jnp.zeros((op.num_nodes, d), jnp.float32).at[:n].set(
        jnp.asarray(x))
    y2 = np.asarray(op(x_p, 2).astype(jnp.float32))
    ref2 = x_pad
    for _ in range(2):
        ref2 = (a_pad.T @ (a_pad @ ref2)) * op.hop_scale
    np.testing.assert_allclose(y2[:n], ref2[:n], rtol=6e-2, atol=2e-2)
