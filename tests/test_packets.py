"""Edge-packet format + kernel tests (interpret mode) and the
pack-latency-aware TrainConfig format rule (VERDICT r3 item 8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpugraph.ops.packets import (
    EdgePackets,
    pack_edges,
    pack_edges_transpose,
    packets_to_dense,
)
from tpugraph.ops.pallas_packets import packets_matvec, spmm_packets


def _random_coo(rng, n, e):
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    return s, r, w


def test_pack_edges_roundtrip(rng):
    n, e = 90, 400
    s, r, w = _random_coo(rng, n, e)
    p = pack_edges(s, r, w, n, block_r=32, block_c=32, k=8)
    dense = np.zeros((p.num_nodes, p.num_nodes), np.float32)
    np.add.at(dense, (r, s), w)
    np.testing.assert_allclose(packets_to_dense(p), dense, atol=1e-5)


def test_spmm_packets_matches_dense(rng):
    n, e, d = 90, 400, 128
    s, r, w = _random_coo(rng, n, e)
    p = pack_edges(s, r, w, n, block_r=32, block_c=32, k=8)
    dense = packets_to_dense(p)
    x = rng.standard_normal((p.num_nodes, d)).astype(np.float32)
    y = np.asarray(spmm_packets(p, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, dense @ x, atol=1e-3, rtol=1e-4)


def test_packets_matvec_grad_matches_dense(rng):
    n, e, d = 64, 250, 128
    s, r, w = _random_coo(rng, n, e)
    p = pack_edges(s, r, w, n, block_r=32, block_c=32, k=8)
    p_t = pack_edges_transpose(s, r, w, n, block_r=32, block_c=32, k=8)
    dense = packets_to_dense(p)
    x = jnp.asarray(rng.standard_normal((p.num_nodes, d)).astype(np.float32))

    def f(x):
        return jnp.sum(jnp.sin(packets_matvec(p, p_t, x, interpret=True)))

    def f_ref(x):
        return jnp.sum(jnp.sin(jnp.asarray(dense) @ x))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(f_ref)(x)),
        atol=1e-3, rtol=1e-3,
    )


def test_resolve_bcsr_format_crossover():
    """The auto rule picks packets when pack latency dominates (short
    runs on low-locality graphs) and tiles for long runs / dense tiles —
    the measured win condition (BENCH_r03: pack 2.5 s vs 72 s,
    steady-state 2.26e8 vs 9.4e8 edges/s)."""
    from tpugraph.train.loop import TrainConfig, resolve_bcsr_format

    # bench-scale: 2.1M edges, 21k tiles at 256-block, density 0.0015
    args = dict(n_live=2_100_000, t_probe=21_000, density=0.0015,
                low_locality=True, on_tpu=True)
    short = TrainConfig(num_epochs=100, use_bcsr=True, bcsr_block=256)
    long = TrainConfig(num_epochs=10_000, use_bcsr=True, bcsr_block=256)
    assert resolve_bcsr_format(short, **args) == "packets"
    assert resolve_bcsr_format(long, **args) == "tiles"
    # dense-tile graphs never use packets
    banded = dict(args, density=0.04)
    assert resolve_bcsr_format(short, **banded) == "tiles"
    # explicit override wins
    forced = TrainConfig(num_epochs=100, use_bcsr=True,
                         bcsr_format="tiles")
    assert resolve_bcsr_format(forced, **args) == "tiles"
    # off-TPU auto never picks packets
    assert resolve_bcsr_format(short, **dict(args, on_tpu=False)) == "tiles"
    # 128-block pack estimate scales by tile AREA (advisor r4): the same
    # graph has ~4x more, ~4x cheaper tiles — same total pack cost, so
    # the decision must not flip with block size
    short128 = TrainConfig(num_epochs=100, use_bcsr=True, bcsr_block=128)
    assert resolve_bcsr_format(
        short128, **dict(args, t_probe=4 * 21_000)) == "packets"


def test_resolve_bcsr_format_precedence_and_override(monkeypatch):
    """Attention models and a forced resident path never get packets
    (advisor r4: PacketAdj raises at trace time for att, and
    bcsr_resident='on' must not be silently overridden); TPUGRAPH_RATES
    overrides the v5e-measured constants (VERDICT r4 item 9)."""
    from tpugraph.train.loop import TrainConfig, resolve_bcsr_format

    args = dict(n_live=2_100_000, t_probe=21_000, density=0.0015,
                low_locality=True, on_tpu=True)
    short = TrainConfig(num_epochs=100, use_bcsr=True, bcsr_block=256)
    assert resolve_bcsr_format(short, **args) == "packets"
    # att forces tiles even when the cost model prefers packets
    assert resolve_bcsr_format(short, **args, att=True) == "tiles"
    # forced resident path forces tiles
    res_on = TrainConfig(num_epochs=100, use_bcsr=True, bcsr_block=256,
                         bcsr_resident="on")
    assert resolve_bcsr_format(res_on, **args) == "tiles"
    # rate override: a hypothetical chip where the resident pack is free
    # flips the short-run decision to tiles
    monkeypatch.setenv("TPUGRAPH_RATES", "res_pack_s_per_tile=0")
    assert resolve_bcsr_format(short, **args) == "tiles"
    monkeypatch.setenv("TPUGRAPH_RATES", "not_a_key=1")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown key"):
        resolve_bcsr_format(short, **args)


def test_train_packets_matches_coo(rng):
    """train_node_classifier(bcsr_format='packets') reproduces the COO
    path's loss trajectory — the packet kernel is a product path, not a
    bench artifact (VERDICT r3 item 8 done criterion)."""
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.train.loop import TrainConfig, train_node_classifier

    n = 96
    s = np.arange(n, dtype=np.int32)
    r = ((s + 1) % n).astype(np.int32)
    s2 = np.concatenate([s, r])
    r2 = np.concatenate([r, s])
    g = graph_from_edges(s2, r2, n)
    feat = rng.standard_normal((g.num_nodes_padded, 6)).astype(np.float32)
    labels = (np.arange(n) * 3 // n).astype(np.int32)
    model = GcnEncoderNode(input_dim=6, hidden_dim=8, embedding_dim=8,
                           label_dim=3, num_layers=3)

    cfg_coo = TrainConfig(num_epochs=4, scan_chunk=2)
    out_coo = train_node_classifier(model, g, feat, labels, cfg_coo, seed=0)
    cfg_pkt = TrainConfig(num_epochs=4, scan_chunk=2, use_bcsr=True,
                          bcsr_format="packets",
                          packet_geom=(32, 32, 8))
    out_pkt = train_node_classifier(model, g, feat, labels, cfg_pkt, seed=0)
    np.testing.assert_allclose(out_pkt["history"]["loss"],
                               out_coo["history"]["loss"],
                               rtol=1e-3, atol=1e-4)
