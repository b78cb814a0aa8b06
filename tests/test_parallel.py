"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import __graft_entry__ as graft
from tpugraph.core.graph import graph_from_dense
from tpugraph.parallel.mesh import make_mesh
from tpugraph.parallel.spmd import shard_graph_edges, sharded_spmm
from tpugraph.ops.message import spmm


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_sharded_spmm_matches_single_device(rng, mesh8):
    n = 64
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a, num_edges_padded=1024)  # multiple of 8
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 6)).astype(np.float32))

    y_ref = spmm(g.senders, g.receivers, g.edge_weight, x)

    gs = shard_graph_edges(g, mesh8)
    f = sharded_spmm(mesh8)
    y_sharded = f(gs.senders, gs.receivers, gs.edge_weight, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), atol=1e-4
    )


def test_shard_graph_pads_edges_to_mesh_multiple(rng, mesh8):
    n = 16
    a = np.zeros((n, n), np.float32)
    a[0, 1] = a[1, 0] = 1
    a[2, 3] = a[3, 2] = 1
    g = graph_from_dense(a)  # 4 directed edges -> padded to 8 by default
    gs = shard_graph_edges(g, mesh8)
    assert gs.num_edges_padded % 8 == 0


def test_dryrun_multichip_entrypoints():
    graft.dryrun_multichip(8)
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 2 and np.all(np.isfinite(np.asarray(out)))


def test_sharded_train_step_loss_decreases(mesh8):
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.spmd import make_sharded_node_train_step

    model, g, x, y = graft._tiny_problem()
    gs = shard_graph_edges(g, mesh8)
    repl = NamedSharding(mesh8, P())
    x = jax.device_put(x, repl)
    y = jax.device_put(y, repl)
    mask = jax.device_put(gs.node_mask, repl)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), x,
                   SparseAdj(gs.senders, gs.receivers, gs.edge_weight)),
        repl,
    )
    tx = optax.adam(1e-2)
    opt_state = jax.device_put(tx.init(params), repl)
    step = make_sharded_node_train_step(model, tx, mesh8)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, gs, x, y, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_explainer_query_sharding(mesh8):
    """Explainer queries sharded over the mesh give the same masks."""
    from tpugraph.cli.config import Config
    from tpugraph.cli.tasks import syn_task, build_node_model
    from tpugraph.explain import Explainer

    cfg = Config(dataset="syn1", num_epochs=50, eval_every=50)
    out = syn_task(cfg)
    cg = out["cg"]
    model = build_node_model(cfg, cg["feat"].shape[2], cg["pred"].shape[2])
    ex = Explainer(model, out["params"], cg["adj"], cg["feat"], cg["label"],
                   cg["pred"], n_hops=3, dataset="syn1")
    nodes = [400, 405, 410]  # not a multiple of 8 -> exercises padding
    single = ex.explain_nodes_batch(nodes)
    sharded = ex.explain_nodes_batch(nodes, mesh=mesh8)
    assert len(sharded) == len(nodes)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["masked_adj"], b["masked_adj"],
                                   atol=1e-4)


def test_node_partitioned_spmm(rng, mesh8):
    from tpugraph.parallel.spmd import (
        partition_edges_by_receiver,
        sharded_spmm_node_partitioned,
    )

    n = 96
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    gp, ns = partition_edges_by_receiver(g, 8)
    assert ns * 8 >= g.num_nodes_padded
    x = rng.standard_normal((ns * 8, 6)).astype(np.float32)
    y_ref = np.asarray(spmm(g.senders, g.receivers, g.edge_weight,
                            jnp.asarray(x[: g.num_nodes_padded])))
    f = sharded_spmm_node_partitioned(mesh8)
    y = np.asarray(f(gp.senders, gp.receivers, gp.edge_weight,
                     jnp.asarray(x)))
    np.testing.assert_allclose(y[: g.num_nodes_padded], y_ref, atol=1e-4)


def test_halo_exchange_spmm(rng, mesh8):
    from tpugraph.parallel.spmd import apply_halo_spmm, build_halo_plan

    n = 96
    a = (rng.random((n, n)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    n_total = plan.shard_size * 8
    x = rng.standard_normal((n_total, 6)).astype(np.float32)
    y_ref = np.asarray(spmm(g.senders, g.receivers, g.edge_weight,
                            jnp.asarray(x[: g.num_nodes_padded])))
    y = np.asarray(apply_halo_spmm(mesh8, plan, jnp.asarray(x)))
    np.testing.assert_allclose(y[: g.num_nodes_padded], y_ref, atol=1e-4)


def test_halo_exchange_locality(rng, mesh8):
    """On a banded (locality-rich) graph the halo is much smaller than
    full feature replication."""
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.parallel.spmd import apply_halo_spmm, build_halo_plan

    n = 256
    src = np.arange(n, dtype=np.int32)
    dst = (src + 1) % n  # ring: each shard needs only 1-2 boundary nodes
    s = np.concatenate([src, dst])
    r = np.concatenate([dst, src])
    g = graph_from_edges(s, r, n)
    plan = build_halo_plan(g, 8)
    x = rng.standard_normal((plan.shard_size * 8, 4)).astype(np.float32)
    y_ref = np.asarray(spmm(g.senders, g.receivers, g.edge_weight,
                            jnp.asarray(x[: g.num_nodes_padded])))
    y = np.asarray(apply_halo_spmm(mesh8, plan, jnp.asarray(x)))
    np.testing.assert_allclose(y[: g.num_nodes_padded], y_ref, atol=1e-4)
    # per-peer halo is tiny vs the 32-node shard
    assert plan.halo_size <= 8


def test_halo_node_training_matches_single_device(rng, mesh8):
    """Multi-layer GcnEncoderNode trains node-partitioned with per-layer
    boundary-only halo exchange; loss trajectory matches single-device
    (VERDICT r1 item 4 done criterion)."""
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.nn.losses import node_cross_entropy
    from tpugraph.parallel.spmd import (
        build_halo_plan,
        make_halo_node_forward,
        make_halo_node_train_step,
    )

    n = 96
    a = (rng.random((n, n)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    n_total = plan.shard_size * 8
    assert n_total == g.num_nodes_padded == n

    d, c = 6, 3
    x = jnp.asarray(rng.standard_normal((n_total, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n_total).astype(np.int32))
    mask = jnp.asarray((np.arange(n_total) < n).astype(np.float32))

    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=c, num_layers=3)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params0 = model.init(jax.random.PRNGKey(0), x, sp)
    tx = optax.adam(1e-2)

    @jax.jit
    def ref_step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(logits, y, node_mask=mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, tx.init(params0)
    ref_losses = []
    for _ in range(6):
        params, opt_state, loss = ref_step(params, opt_state)
        ref_losses.append(float(loss))

    step = make_halo_node_train_step(model, tx, mesh8)
    params_h, opt_h = params0, tx.init(params0)
    halo_losses = []
    for _ in range(6):
        params_h, opt_h, loss = step(params_h, opt_h, plan, x, y, mask)
        halo_losses.append(float(loss))

    np.testing.assert_allclose(halo_losses, ref_losses, rtol=2e-4, atol=2e-5)

    # node-sharded forward parity after training
    fwd = make_halo_node_forward(model, mesh8)
    logits_h = np.asarray(fwd(params_h, plan, x))
    logits_ref, _ = model.apply(params, x, sp)
    np.testing.assert_allclose(logits_h, np.asarray(logits_ref), atol=5e-4)


def test_halo_gat_matches_sparse(rng, mesh8):
    """GAT attention on the halo path == the SparseAdj path."""
    from tpugraph.nn.layers import GraphConv, SparseAdj
    from tpugraph.parallel.spmd import build_halo_plan
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    assert plan.shard_size * 8 == g.num_nodes_padded
    d = 6
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    layer = GraphConv(input_dim=d, output_dim=5, att=True)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = layer.init(jax.random.PRNGKey(0), x, sp)
    y_ref, _ = layer.apply(params, x, sp)

    from tpugraph.parallel.spmd import _halo_adj_from_slices

    def local(p, si, slot, rl, w, xl):
        adj = _halo_adj_from_slices(si, slot, rl, w, "data")
        y, _ = layer.apply(p, xl, adj)
        return y

    f = shard_map(
        local, mesh=mesh8,
        in_specs=(P(),) + (P("data"),) * 5,
        out_specs=P("data"), check_vma=False,
    )
    y_halo = f(params, plan.send_idx, plan.sender_slot,
               plan.receivers_local, plan.weights, x)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_ref),
                               atol=1e-4)


def test_halo_bcsr_training_matches_single_device(rng, mesh8):
    """Multi-layer GcnEncoderNode trains node-partitioned with the
    per-shard Pallas BCSR halo path (rect BCSR over [local | halo]
    columns); loss trajectory matches single-device (VERDICT r2 item 3
    done criterion)."""
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.nn.losses import node_cross_entropy
    from tpugraph.parallel.spmd import (
        build_halo_bcsr,
        build_halo_plan,
        make_halo_bcsr_forward,
        make_halo_bcsr_train_step,
    )

    n = 96
    a = (rng.random((n, n)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    bplan = build_halo_bcsr(plan, 8, block=8)
    n_total = plan.shard_size * 8
    assert n_total == g.num_nodes_padded == n

    d, c = 6, 3
    x = jnp.asarray(rng.standard_normal((n_total, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n_total).astype(np.int32))
    mask = jnp.asarray((np.arange(n_total) < n).astype(np.float32))

    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=c, num_layers=3)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params0 = model.init(jax.random.PRNGKey(0), x, sp)
    tx = optax.adam(1e-2)

    @jax.jit
    def ref_step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(logits, y, node_mask=mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, tx.init(params0)
    ref_losses = []
    for _ in range(5):
        params, opt_state, loss = ref_step(params, opt_state)
        ref_losses.append(float(loss))

    step = make_halo_bcsr_train_step(model, tx, mesh8)
    params_h, opt_h = params0, tx.init(params0)
    bcsr_losses = []
    for _ in range(5):
        params_h, opt_h, loss = step(params_h, opt_h, bplan, x, y, mask)
        bcsr_losses.append(float(loss))

    np.testing.assert_allclose(bcsr_losses, ref_losses, rtol=2e-4, atol=2e-5)

    fwd = make_halo_bcsr_forward(model, mesh8)
    logits_h = np.asarray(fwd(params_h, bplan, x))
    logits_ref, _ = model.apply(params, x, sp)
    np.testing.assert_allclose(logits_h, np.asarray(logits_ref), atol=5e-4)


def test_halo_overlap_training_matches_halo(rng, mesh8):
    """The SPLIT (overlapped) halo path reproduces the plain halo path's
    loss trajectory exactly — same edges, reordered into local-local +
    halo-dependent sets (VERDICT r3 item 2 done criterion)."""
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.spmd import (
        build_halo_plan,
        make_halo_node_train_step,
        make_halo_overlap_forward,
        make_halo_overlap_train_step,
        split_halo_plan,
    )

    n = 96
    a = (rng.random((n, n)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    oplan = split_halo_plan(plan, 8)
    # the local-local set should dominate on a contiguous partition
    n_loc = int((np.asarray(oplan.w_loc) != 0).sum())
    n_halo = int((np.asarray(oplan.w_halo) != 0).sum())
    assert n_loc + n_halo == int((np.asarray(plan.weights) != 0).sum())

    d, c = 6, 3
    n_total = plan.shard_size * 8
    x = jnp.asarray(rng.standard_normal((n_total, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n_total).astype(np.int32))
    mask = jnp.asarray((np.arange(n_total) < n).astype(np.float32))
    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=c, num_layers=3)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params0 = model.init(jax.random.PRNGKey(0), x, sp)
    tx = optax.adam(1e-2)

    step_h = make_halo_node_train_step(model, tx, mesh8)
    step_o = make_halo_overlap_train_step(model, tx, mesh8)
    ph, oh = params0, tx.init(params0)
    po, oo = params0, tx.init(params0)
    for _ in range(5):
        ph, oh, loss_h = step_h(ph, oh, plan, x, y, mask)
        po, oo, loss_o = step_o(po, oo, oplan, x, y, mask)
        np.testing.assert_allclose(float(loss_o), float(loss_h),
                                   rtol=2e-5, atol=2e-6)

    fwd = make_halo_overlap_forward(model, mesh8)
    logits_o = np.asarray(fwd(po, oplan, x))
    logits_h, _ = model.apply(ph, x, sp)
    np.testing.assert_allclose(logits_o, np.asarray(logits_h), atol=5e-4)


def test_halo_bcsr_overlap_training_matches_single_device(rng, mesh8):
    """Overlapped BCSR halo training (square local kernel concurrent
    with the all_to_all + rect halo kernel) matches single-device."""
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.nn.losses import node_cross_entropy
    from tpugraph.parallel.spmd import (
        build_halo_bcsr_overlap,
        build_halo_plan,
        make_halo_bcsr_overlap_forward,
        make_halo_bcsr_overlap_train_step,
    )

    n = 96
    a = (rng.random((n, n)) < 0.08).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    bplan = build_halo_bcsr_overlap(plan, 8, block=8)
    n_total = plan.shard_size * 8

    d, c = 6, 3
    x = jnp.asarray(rng.standard_normal((n_total, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n_total).astype(np.int32))
    mask = jnp.asarray((np.arange(n_total) < n).astype(np.float32))
    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=c, num_layers=3)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params0 = model.init(jax.random.PRNGKey(0), x, sp)
    tx = optax.adam(1e-2)

    @jax.jit
    def ref_step(params, opt_state):
        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(logits, y, node_mask=mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, tx.init(params0)
    ref_losses = []
    for _ in range(5):
        params, opt_state, loss = ref_step(params, opt_state)
        ref_losses.append(float(loss))

    step = make_halo_bcsr_overlap_train_step(model, tx, mesh8)
    params_h, opt_h = params0, tx.init(params0)
    ov_losses = []
    for _ in range(5):
        params_h, opt_h, loss = step(params_h, opt_h, bplan, x, y, mask)
        ov_losses.append(float(loss))

    np.testing.assert_allclose(ov_losses, ref_losses, rtol=2e-4, atol=2e-5)

    fwd = make_halo_bcsr_overlap_forward(model, mesh8)
    logits_h = np.asarray(fwd(params_h, bplan, x))
    logits_ref, _ = model.apply(params, x, sp)
    np.testing.assert_allclose(logits_h, np.asarray(logits_ref), atol=5e-4)


def test_halo_overlap_gat_matches_sparse(rng, mesh8):
    """GAT attention on the overlapped COO halo path == SparseAdj."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tpugraph.nn.layers import GraphConv, HaloOverlapAdj, SparseAdj
    from tpugraph.parallel.spmd import build_halo_plan, split_halo_plan

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    op = split_halo_plan(plan, 8)
    d = 6
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    layer = GraphConv(input_dim=d, output_dim=5, att=True)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = layer.init(jax.random.PRNGKey(0), x, sp)
    y_ref, _ = layer.apply(params, x, sp)

    def local(p, arrs, xl):
        si, sl, rl, wl, hs, rh, wh = arrs
        adj = HaloOverlapAdj(si[0], sl[0], rl[0], wl[0],
                             hs[0], rh[0], wh[0], "data")
        y, _ = layer.apply(p, xl, adj)
        return y

    f = shard_map(
        local, mesh=mesh8,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    arrs = (op.send_idx, op.s_loc, op.r_loc, op.w_loc,
            op.h_slot, op.r_halo, op.w_halo)
    y_halo = f(params, arrs, x)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_ref),
                               atol=1e-4)


def test_halo_bcsr_gat_matches_sparse(rng, mesh8):
    """GAT attention on the BCSR-halo path (tile-support SDDMM) matches
    the SparseAdj attention path, forward AND gradients (VERDICT r3
    item 9 done criterion)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tpugraph.nn.layers import GraphConv, SparseAdj
    from tpugraph.parallel.spmd import (
        _bcsr_slice0,
        _tp_slice0,
        build_halo_bcsr,
        build_halo_plan,
    )

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    bplan = build_halo_bcsr(plan, 8, block=8, att=True)
    assert bplan.tp is not None
    d = 6
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    layer = GraphConv(input_dim=d, output_dim=5, att=True)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = layer.init(jax.random.PRNGKey(0), x, sp)
    y_ref, _ = layer.apply(params, x, sp)

    def local(p, arrs, xl):
        from tpugraph.nn.layers import HaloBCSRAdj

        si, m, m_t, tp = arrs
        adj = HaloBCSRAdj(si[0], _bcsr_slice0(m), _bcsr_slice0(m_t),
                          _tp_slice0(tp), "data")
        y, _ = layer.apply(p, xl, adj)
        return y

    f = shard_map(
        local, mesh=mesh8,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    arrs = (bplan.send_idx, bplan.m, bplan.m_t, bplan.tp)
    y_halo = f(params, arrs, x)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_ref),
                               atol=1e-4)

    # gradients flow through the attention scores on both paths
    def loss_sp(p):
        y, _ = layer.apply(p, x, sp)
        return jnp.sum(y * y)

    def loss_halo(p):
        y = f(p, arrs, x)
        return jnp.sum(y * y)

    g_sp = jax.grad(loss_sp)(params)
    g_h = jax.grad(loss_halo)(params)
    for k in ("att_weight", "weight"):
        np.testing.assert_allclose(
            np.asarray(g_h["params"][k]), np.asarray(g_sp["params"][k]),
            atol=2e-3, rtol=1e-3,
        )
        assert float(np.abs(np.asarray(g_sp["params"][k])).max()) > 0


def test_bcsr_rectangular_spmm(rng):
    """Rect BCSR (num_col_nodes != num_nodes) matches dense on both the
    plain and packed kernels."""
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_to_dense
    from tpugraph.ops.pallas_spmm import spmm_bcsr

    n_r, n_c = 40, 90
    rows = rng.integers(0, n_r, 300).astype(np.int32)
    cols = rng.integers(0, n_c, 300).astype(np.int32)
    w = rng.standard_normal(300).astype(np.float32)
    m = bcsr_from_coo(cols, rows, w, n_r, block=16, num_col_nodes=n_c)
    dense = np.zeros((m.num_row_nodes, m.num_nodes), np.float32)
    np.add.at(dense, (rows, cols), w)
    np.testing.assert_allclose(bcsr_to_dense(m), dense, atol=1e-5)
    x = rng.standard_normal((m.num_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm_bcsr(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, dense @ x, atol=1e-3, rtol=1e-4)


def test_2d_mesh_dcn_data_spmm(rng):
    """Edge-partitioned SpMM over a 2-D ("dcn", "data") mesh — the
    multi-host mesh shape (VERDICT r1 item 5)."""
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.spmd import sharded_spmm

    mesh = make_mesh(axis_names=("dcn", "data"), shape=(2, 4))
    assert mesh.shape == {"dcn": 2, "data": 4}
    n = 48
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a, num_edges_padded=512)
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 6))
                    .astype(np.float32))
    y_ref = spmm(g.senders, g.receivers, g.edge_weight, x)
    f = sharded_spmm(mesh, axis=("dcn", "data"))
    y = f(g.senders, g.receivers, g.edge_weight, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_make_mesh_validation():
    from tpugraph.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="explicit shape"):
        make_mesh(axis_names=("dcn", "data"))
    with pytest.raises(ValueError, match="needs"):
        make_mesh(axis_names=("a", "b"), shape=(4, 4))


def test_dp_graph_training_matches_single_device(mesh8, tmp_path):
    """Data-parallel graph classification reproduces the single-device
    loss trajectory (VERDICT r1 item 6)."""
    from tests.test_tasks import write_tu_dataset
    from tpugraph.cli.config import Config
    from tpugraph.cli.tasks import benchmark_task

    write_tu_dataset(str(tmp_path), "TOY")
    common = dict(bmname="TOY", datadir=str(tmp_path), num_epochs=8,
                  batch_size=8, eval_every=8, max_nodes=0, seed=0)
    cfg1 = Config(**common)
    cfg1.ckptdir = str(tmp_path / "ckpt1")
    out1 = benchmark_task(cfg1)
    cfg8 = Config(**common, dp_devices=8)
    cfg8.ckptdir = str(tmp_path / "ckpt8")
    out8 = benchmark_task(cfg8)
    np.testing.assert_allclose(out8["history"]["loss"],
                               out1["history"]["loss"], rtol=1e-3, atol=1e-4)


def test_tensor_parallel_matches_replicated(rng):
    """Column-sharded (tensor-parallel) weights produce the same forward,
    gradients, and training trajectory as replicated weights (SURVEY
    §2.2 TP row)."""
    import optax

    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.tp import (
        make_tp_node_train_step,
        shard_params_tp,
        tp_shardings,
    )

    mesh = make_mesh(8, axis_names=("model",))
    n, d, c = 48, 16, 3
    a = (rng.random((n, n)) < 0.12).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, d))
                    .astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, g.num_nodes_padded).astype(np.int32))
    model = GcnEncoderNode(input_dim=d, hidden_dim=32, embedding_dim=32,
                           label_dim=c, num_layers=3)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = model.init(jax.random.PRNGKey(0), x, sp)

    # hidden-dim kernels sharded, tiny head replicated
    sh = tp_shardings(params, mesh)
    specs = {ns.spec for ns in jax.tree_util.tree_leaves(sh)}
    from jax.sharding import PartitionSpec as P
    assert P(None, "model") in specs and P() in specs

    params_tp = shard_params_tp(params, mesh)
    fwd = jax.jit(lambda p, x: model.apply(p, x, sp)[0])
    np.testing.assert_allclose(np.asarray(fwd(params_tp, x)),
                               np.asarray(fwd(params, x)), atol=1e-4)

    tx = optax.adam(1e-2)
    step_tp = make_tp_node_train_step(model, tx, mesh)
    p_tp, o_tp = params_tp, tx.init(params_tp)

    @jax.jit
    def step_ref(p, o):
        from tpugraph.nn.losses import node_cross_entropy

        def loss_fn(p):
            logits, _ = model.apply(p, x, sp)
            return node_cross_entropy(logits, y, node_mask=g.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, o_ref = params, tx.init(params)
    for _ in range(5):
        p_tp, o_tp, loss_tp = step_tp(p_tp, o_tp, g.senders, g.receivers,
                                      g.edge_weight, x, y, g.node_mask)
        p_ref, o_ref, loss_ref = step_ref(p_ref, o_ref)
        np.testing.assert_allclose(float(loss_tp), float(loss_ref),
                                   rtol=2e-4)
    # weights remain tensor-parallel after updates
    kern = p_tp["params"]["stack"]["conv_first"]["weight"]
    assert kern.sharding.spec == P(None, "model")


def test_halo_bcsr_overlap_gat_matches_sparse(rng, mesh8):
    """GAT on the OVERLAPPED BCSR-halo path (two tile-support SDDMMs,
    one per split) matches the SparseAdj attention path, forward AND
    gradients (VERDICT r4 item 7 done criterion — the guard at the
    former nn/layers.py:433 is gone)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tpugraph.nn.layers import GraphConv, SparseAdj
    from tpugraph.parallel.spmd import (
        _overlap_adj_from_arrs,
        _overlap_plan_arrs,
        build_halo_bcsr_overlap,
        build_halo_plan,
    )

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    plan = build_halo_plan(g, 8)
    oplan = build_halo_bcsr_overlap(plan, 8, block=8, att=True)
    assert oplan.tp_loc is not None and oplan.tp_halo is not None
    d = 6
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    layer = GraphConv(input_dim=d, output_dim=5, att=True)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = layer.init(jax.random.PRNGKey(0), x, sp)
    y_ref, _ = layer.apply(params, x, sp)

    def local(p, arrs, xl):
        adj = _overlap_adj_from_arrs(arrs, "data")
        y, _ = layer.apply(p, xl, adj)
        return y

    f = shard_map(
        local, mesh=mesh8,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    arrs = _overlap_plan_arrs(oplan)
    y_halo = f(params, arrs, x)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_ref),
                               atol=1e-4)

    def loss_sp(p):
        y, _ = layer.apply(p, x, sp)
        return jnp.sum(y * y)

    def loss_halo(p):
        y = f(p, arrs, x)
        return jnp.sum(y * y)

    g_sp = jax.grad(loss_sp)(params)
    g_h = jax.grad(loss_halo)(params)
    for k in ("att_weight", "weight"):
        np.testing.assert_allclose(
            np.asarray(g_h["params"][k]), np.asarray(g_sp["params"][k]),
            atol=2e-3, rtol=1e-3,
        )
        assert float(np.abs(np.asarray(g_sp["params"][k])).max()) > 0


def test_halo_unified_entry_point(rng, mesh8):
    """build_halo + make_halo_train_step route BOTH overlap policies to
    working kernels with matching losses (VERDICT r4 item 4): on the CPU
    proxy 'auto' resolves to plain, 'on' forces the split path."""
    import optax
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.spmd import (
        HaloBCSROverlapPlan,
        HaloBCSRPlan,
        build_halo,
        make_halo_forward,
        make_halo_train_step,
        resolve_halo_overlap,
    )

    assert resolve_halo_overlap("auto", mesh8) is False  # CPU proxy
    assert resolve_halo_overlap("on", mesh8) is True

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    d, n_cls = 6, 3
    x_np = rng.standard_normal((n, d)).astype(np.float32)
    y_np = rng.integers(0, n_cls, n).astype(np.int32)
    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=n_cls, num_layers=2)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np), sp)
    tx = optax.adam(1e-2)

    losses = {}
    for overlap, want_type in (("auto", HaloBCSRPlan),
                               ("on", HaloBCSROverlapPlan)):
        plan = build_halo(g, mesh8, bcsr=True, block=8, overlap=overlap)
        assert isinstance(plan, want_type), (overlap, type(plan))
        n_total = plan.shard_size * 8
        x = jnp.zeros((n_total, d), jnp.float32).at[:n].set(x_np)
        y = jnp.zeros((n_total,), jnp.int32).at[:n].set(y_np)
        m = jnp.zeros((n_total,), jnp.float32).at[:n].set(1.0)
        step = make_halo_train_step(model, tx, mesh8, plan)
        p, o = params, tx.init(params)
        p, o, loss = step(p, o, plan, x, y, m)
        losses[overlap] = float(loss)
        fwd = make_halo_forward(model, mesh8, plan)
        logits = fwd(p, plan, x)
        assert np.all(np.isfinite(np.asarray(logits)))
    # same edges, same numerics: plain and split losses agree
    np.testing.assert_allclose(losses["auto"], losses["on"],
                               rtol=1e-5, atol=1e-6)

    # COO route through the same entry point
    plan_coo = build_halo(g, mesh8, bcsr=False, overlap="off")
    n_total = plan_coo.shard_size * 8
    x = jnp.zeros((n_total, d), jnp.float32).at[:n].set(x_np)
    y = jnp.zeros((n_total,), jnp.int32).at[:n].set(y_np)
    m = jnp.zeros((n_total,), jnp.float32).at[:n].set(1.0)
    step = make_halo_train_step(model, tx, mesh8, plan_coo)
    _, _, loss_coo = step(params, tx.init(params), plan_coo, x, y, m)
    np.testing.assert_allclose(float(loss_coo), losses["auto"],
                               rtol=1e-5, atol=1e-6)


def test_halo_training_2d_mesh_hierarchical(rng):
    """Node-partitioned halo TRAINING on the 2-D ("dcn","data") mesh:
    the hierarchical two-stage exchange (ICI-inner all_to_all, DCN-outer
    stage — nn.layers.halo_exchange) reproduces the 1-D flat-axis loss
    exactly, on both the COO and BCSR halo paths (VERDICT r4 item 2
    done criterion)."""
    import optax
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.spmd import (
        apply_halo_spmm,
        build_halo_bcsr,
        build_halo_plan,
        make_halo_bcsr_train_step,
        make_halo_node_train_step,
    )

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    n_dev = 8
    plan = build_halo_plan(g, n_dev)
    n_total = plan.shard_size * n_dev
    d, n_cls = 6, 3
    x = jnp.zeros((n_total, d), jnp.float32).at[:n].set(
        jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)))
    y = jnp.zeros((n_total,), jnp.int32).at[:n].set(
        jnp.asarray(rng.integers(0, n_cls, n).astype(np.int32)))
    m = jnp.zeros((n_total,), jnp.float32).at[:n].set(1.0)
    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=n_cls, num_layers=2)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = model.init(jax.random.PRNGKey(0), x, sp)
    tx = optax.adam(1e-2)

    mesh1 = make_mesh(8)
    _, _, loss1 = make_halo_node_train_step(model, tx, mesh1)(
        params, tx.init(params), plan, x, y, m)

    mesh2 = make_mesh(axis_names=("dcn", "data"), shape=(2, 4))
    ax = ("dcn", "data")
    _, _, loss2 = make_halo_node_train_step(model, tx, mesh2, axis=ax)(
        params, tx.init(params), plan, x, y, m)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)

    bplan = build_halo_bcsr(plan, n_dev, block=8)
    _, _, bloss2 = make_halo_bcsr_train_step(model, tx, mesh2, axis=ax)(
        params, tx.init(params), bplan, x, y, m)
    np.testing.assert_allclose(float(bloss2), float(loss1), rtol=1e-4)

    # raw halo SpMM matches across mesh shapes too
    y1d = apply_halo_spmm(mesh1, plan, x)
    y2d = apply_halo_spmm(mesh2, plan, x, axis=ax)
    np.testing.assert_allclose(np.asarray(y2d), np.asarray(y1d),
                               atol=1e-5)


def test_halo_trainer_matches_single_device_trajectory(rng, mesh8):
    """train_node_classifier_halo (the --halo CLI path) reproduces the
    single-device train_node_classifier loss trajectory: same split rng,
    same init key, same optimizer, same global loss normalization."""
    import networkx as nx
    from tpugraph.core.graph import graph_from_networkx
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.train.loop import (
        TrainConfig,
        train_node_classifier,
        train_node_classifier_halo,
    )

    G = nx.random_regular_graph(4, 64, seed=0)
    g = graph_from_networkx(G)
    n = G.number_of_nodes()
    feat = rng.standard_normal((g.num_nodes_padded, 6)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int64)
    model = GcnEncoderNode(input_dim=6, hidden_dim=8, embedding_dim=8,
                           label_dim=3, num_layers=2)
    cfg = TrainConfig(num_epochs=6, eval_every=3, scan_chunk=3)

    out_ref = train_node_classifier(model, g, feat, labels, cfg, seed=0)
    out_halo = train_node_classifier_halo(
        model, g, feat, labels, cfg, n_dev=4, overlap="off",
        partition="locality", seed=0,
    )
    # epoch 0 matches exactly (same init/split/loss); later epochs
    # drift by float association (sharded grad psum reorders sums and
    # Adam amplifies) — tolerance covers 6 epochs of that
    np.testing.assert_allclose(out_halo["history"]["loss"][0],
                               out_ref["history"]["loss"][0], rtol=1e-5)
    np.testing.assert_allclose(out_halo["history"]["loss"],
                               out_ref["history"]["loss"],
                               rtol=2e-3)
    # predictions come back in ORIGINAL node-id order
    assert out_halo["ypred"].shape[1] >= n
    np.testing.assert_allclose(
        out_halo["ypred"][0, :n], out_ref["ypred"][0, :n],
        rtol=5e-2, atol=5e-3,
    )
    # BCSR halo route through the same trainer
    cfg_b = TrainConfig(num_epochs=6, eval_every=3, use_bcsr=True,
                        bcsr_block=8)
    out_bcsr = train_node_classifier_halo(
        model, g, feat, labels, cfg_b, n_dev=4, overlap="on", seed=0,
    )
    np.testing.assert_allclose(out_bcsr["history"]["loss"],
                               out_ref["history"]["loss"],
                               rtol=2e-3)


def test_halo_unified_entry_gat_overlap(rng, mesh8):
    """An attention model trains through the unified halo entry point on
    BOTH overlap routes (VERDICT r4 items 4+7 composed): losses agree
    between the plain att plan (build_halo att=True) and the overlapped
    att plan, and with the COO halo att step."""
    import optax
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.spmd import build_halo, make_halo_train_step

    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    g = graph_from_dense(a)
    d, n_cls = 6, 3
    x_np = rng.standard_normal((n, d)).astype(np.float32)
    y_np = rng.integers(0, n_cls, n).astype(np.int32)
    model = GcnEncoderNode(input_dim=d, hidden_dim=8, embedding_dim=8,
                           label_dim=n_cls, num_layers=2, att=True)
    sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np), sp)
    tx = optax.adam(1e-2)

    losses = {}
    for tag, kwargs in (
            ("bcsr_plain", dict(bcsr=True, block=8, overlap="off")),
            ("bcsr_overlap", dict(bcsr=True, block=8, overlap="on")),
            ("coo_overlap", dict(bcsr=False, overlap="on"))):
        plan = build_halo(g, mesh8, att=True, **kwargs)
        n_total = plan.shard_size * 8
        x = jnp.zeros((n_total, d), jnp.float32).at[:n].set(x_np)
        y = jnp.zeros((n_total,), jnp.int32).at[:n].set(y_np)
        m = jnp.zeros((n_total,), jnp.float32).at[:n].set(1.0)
        step = make_halo_train_step(model, tx, mesh8, plan)
        _, _, loss = step(params, tx.init(params), plan, x, y, m)
        losses[tag] = float(loss)
    np.testing.assert_allclose(losses["bcsr_overlap"],
                               losses["bcsr_plain"], rtol=1e-4)
    np.testing.assert_allclose(losses["coo_overlap"],
                               losses["bcsr_plain"], rtol=1e-4)
