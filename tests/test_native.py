"""Native C++ graph-engine tests (ctypes), cross-checked vs NumPy."""

import numpy as np
import pytest

from tpugraph import native


def coo(rng, n=200, p=0.03):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    s, r = np.nonzero(a)
    w = rng.random(len(s)).astype(np.float32) + 0.1
    return s.astype(np.int32), r.astype(np.int32), w, n


def test_native_builds():
    assert native.native_available(), "C++ toolchain should be present"


def test_coo_to_csr(rng):
    s, r, w, n = coo(rng)
    indptr, indices, perm = native.coo_to_csr(r, s, n)
    assert indptr[-1] == len(s)
    # every row segment contains exactly the senders of that receiver
    for u in range(n):
        seg = sorted(indices[indptr[u]:indptr[u + 1]])
        expected = sorted(s[r == u])
        assert seg == list(expected)
    # perm maps CSR order back to input edges
    np.testing.assert_array_equal(r[perm], np.repeat(
        np.arange(n), np.diff(indptr)))


def test_bcsr_pack_matches_python(rng):
    from tpugraph.ops.bcsr import BCSR, bcsr_from_coo, bcsr_to_dense

    s, r, w, n = coo(rng, n=300)
    m = bcsr_from_coo(s, r, w, n)  # uses native fast path
    dense = np.zeros((n, n), np.float32)
    dense[r, s] = w
    back = bcsr_to_dense(m)[:n, :n]
    np.testing.assert_allclose(back, dense, atol=1e-6)
    # tiles sorted by row block
    row_of = np.asarray(m.row_of)
    assert np.all(np.diff(row_of) >= 0)
    # row_ptr consistent
    rp = np.asarray(m.row_ptr)
    assert rp[-1] == m.num_tiles


def test_khop_bfs_matches_python(rng):
    s, r, w, n = coo(rng, n=120, p=0.02)
    indptr, indices, _ = native.coo_to_csr(r, s, n)
    for src in [0, 17, 119]:
        got = native.khop_bfs(indptr, indices, src, 3)
        # python reference
        mask = np.zeros(n, bool)
        mask[src] = True
        frontier = [src]
        for _ in range(3):
            nxt = []
            for u in frontier:
                for v in indices[indptr[u]:indptr[u + 1]]:
                    if not mask[v]:
                        mask[v] = True
                        nxt.append(int(v))
            frontier = nxt
        np.testing.assert_array_equal(got, mask)


def test_khop_bfs_batch(rng):
    s, r, w, n = coo(rng, n=100)
    indptr, indices, _ = native.coo_to_csr(r, s, n)
    srcs = np.array([3, 50, 99], np.int32)
    batch = native.khop_bfs_batch(indptr, indices, srcs, 2)
    for i, src in enumerate(srcs):
        np.testing.assert_array_equal(
            batch[i], native.khop_bfs(indptr, indices, int(src), 2)
        )


def test_sym_normalize_matches_numpy(rng):
    s, r, w, n = coo(rng)
    got = native.sym_normalize(r, s, w, n)
    deg = np.zeros(n)
    np.add.at(deg, r, w)
    inv = np.where(deg > 0, 1 / np.sqrt(deg), 0)
    expected = (w * inv[r] * inv[s]).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_rcm_order_reduces_bandwidth(rng):
    # shuffle a banded graph; RCM must recover (near-)banded structure
    n = 400
    src = np.arange(n, dtype=np.int64)
    off = rng.integers(1, 12, size=n)
    dst = (src + off) % n
    shuf = rng.permutation(n).astype(np.int32)
    s = shuf[np.concatenate([src, dst])].astype(np.int32)
    r = shuf[np.concatenate([dst, src])].astype(np.int32)
    indptr, indices, _ = native.coo_to_csr(r, s, n)
    perm = native.rcm_order(indptr, indices)
    # valid permutation
    assert sorted(perm.tolist()) == list(range(n))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    bw_before = int(np.abs(s.astype(np.int64) - r).max())
    bw_after = int(np.abs(inv[s] - inv[r]).max())
    assert bw_after < bw_before / 4, (bw_before, bw_after)


def test_rcm_order_matches_numpy_fallback(rng):
    s, r, w, n = coo(rng, n=120)
    indptr, indices, _ = native.coo_to_csr(r, s, n)
    got = native.rcm_order(indptr, indices)
    # run the pure-python fallback by bypassing the lib
    import tpugraph.native as nat
    lib = nat._lib
    nat._lib = False
    try:
        ref = native.rcm_order(indptr, indices)
    finally:
        nat._lib = lib
    np.testing.assert_array_equal(got, ref)


def test_halo_plan_native_matches_python(rng):
    import jax.numpy as jnp

    from tpugraph.core.graph import graph_from_dense
    from tpugraph.parallel import spmd

    a = (rng.random((96, 96)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan_native = spmd.build_halo_plan(g, 8)

    # force the python fallback path
    import tpugraph.native as nat
    lib = nat._lib
    nat._lib = False
    try:
        plan_py = spmd.build_halo_plan(g, 8)
    finally:
        nat._lib = lib
    assert plan_native.shard_size == plan_py.shard_size
    assert plan_native.halo_size == plan_py.halo_size
    for fld in ("send_idx", "sender_slot", "receivers_local", "weights"):
        np.testing.assert_array_equal(
            np.asarray(getattr(plan_native, fld)),
            np.asarray(getattr(plan_py, fld)), err_msg=fld)
