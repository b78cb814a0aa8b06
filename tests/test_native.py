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


def _two_community_graph(rng, n=400, intra=2400, inter=60):
    """Two equal communities with shuffled node ids, dense inside and
    sparse across — the partitioning testbed."""
    comm = np.zeros(n, np.int32)
    comm[n // 2:] = 1
    comm = comm[rng.permutation(n)]
    es, er = [], []
    for c in (0, 1):
        members = np.flatnonzero(comm == c)
        u = rng.choice(members, intra)
        v = rng.choice(members, intra)
        keep = u != v
        es.append(u[keep]); er.append(v[keep])
    u = rng.choice(np.flatnonzero(comm == 0), inter)
    v = rng.choice(np.flatnonzero(comm == 1), inter)
    es.append(u); er.append(v)
    s = np.concatenate(es + er).astype(np.int32)
    r = np.concatenate(er + es).astype(np.int32)
    w = np.ones(len(s), np.float32)
    return s, r, w, comm


def test_label_prop_partition_recovers_communities(rng):
    """Balanced label propagation recovers a planted 2-community split
    from a scattered balanced seed, cutting halo rows by >5x vs the
    degree-snake partition (VERDICT r4 item 1b)."""
    from tpugraph.parallel.spmd import balance_partition

    n = 400
    s, r, w, comm = _two_community_graph(rng, n)
    _, inv = balance_partition(r, n, 2, weights=w)
    snake = (inv[:n] // (len(inv) // 2)).astype(np.int32)
    cut_snake, recv_snake = native.partition_cut_stats(s, r, w, n, 2, snake)

    assign, moves = native.label_prop_partition(s, r, w, n, 2, snake,
                                                iters=30, slack=1.05)
    cut_lp, recv_lp = native.partition_cut_stats(s, r, w, n, 2, assign)
    assert moves > 0
    # balanced within slack
    sizes = np.bincount(assign, minlength=2)
    assert sizes.max() <= int(n / 2 * 1.05) + 1
    # recovers the planted structure: cut collapses to ~the planted
    # inter-community edges
    assert cut_lp < cut_snake / 5, (cut_lp, cut_snake)
    agree = max((assign == comm).mean(), (assign != comm).mean())
    assert agree > 0.95, agree


def test_label_prop_partition_numpy_fallback(rng, monkeypatch):
    """The NumPy fallback reaches the same community structure (not
    necessarily identical assignments — different sweep schedule)."""
    n = 400
    s, r, w, comm = _two_community_graph(rng, n)
    seed = (rng.permutation(n) // (n // 2)).astype(np.int32)

    a_native, _ = native.label_prop_partition(s, r, w, n, 2, seed,
                                              iters=30, slack=1.05)
    monkeypatch.setattr(native, "_lib", False)
    assert not native.native_available()
    a_np, moves_np = native.label_prop_partition(s, r, w, n, 2, seed,
                                                 iters=30, slack=1.05)
    cut_np, _ = native.partition_cut_stats(s, r, w, n, 2, a_np)
    cut_nat, _ = native.partition_cut_stats(s, r, w, n, 2, a_native)
    assert moves_np > 0
    live = int((w != 0).sum())
    assert cut_np < live * 0.2, cut_np
    assert cut_nat < live * 0.2, cut_nat
    # cut stats fallback agrees with native on the same assignment
    monkeypatch.undo()
    cut_ref, recv_ref = native.partition_cut_stats(s, r, w, n, 2, a_np)
    monkeypatch.setattr(native, "_lib", False)
    cut_fb, recv_fb = native.partition_cut_stats(s, r, w, n, 2, a_np)
    assert cut_ref == cut_fb
    np.testing.assert_array_equal(recv_ref, recv_fb)


def test_locality_partition_perm_contract(rng):
    """locality_partition returns a valid permutation: perm/inv inverse
    pairs, contiguous shards hold each partition, pad ids are edge-free."""
    from tpugraph.parallel.spmd import locality_partition

    n = 400
    s, r, w, comm = _two_community_graph(rng, n)
    perm, inv = locality_partition(s, r, n, 4, weights=w)
    n_pad = len(perm)
    assert n_pad % 4 == 0
    np.testing.assert_array_equal(perm[inv], np.arange(n_pad))
    np.testing.assert_array_equal(np.sort(perm), np.arange(n_pad))
    # relabeled edges stay in range and preserve adjacency
    s2, r2 = inv[s], inv[r]
    assert s2.max() < n_pad and r2.max() < n_pad
    # pad slots (perm >= n) have no edges
    assert np.all(perm[np.unique(np.concatenate([s2, r2]))] < n)
