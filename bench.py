"""Headline benchmark: SpMM fwd+bwd edges/s/chip.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the hot op of every GNN layer — sparse neighborhood
aggregation ``y = A @ x`` plus its backward ``dx = A^T @ dy`` — on a
locality-rich graph (banded + random long-range edges, the structure of
the framework's motif/PPI graphs after node ordering).  The Pallas BCSR
kernel (``tpugraph/ops/pallas_spmm.py``) is measured against the XLA
gather/``segment_sum`` COO path on the same chip; the reference
implementation's dense ``[N, N] @ [N, D]`` matmul (models.py:70) cannot
even materialize at this graph size.

``vs_baseline`` = pallas_edges_per_s / xla_coo_edges_per_s  (same chip).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_banded_graph(n: int, deg: int, bandwidth: int, seed: int = 0):
    """Symmetric random graph whose edges stay within a node-id band —
    the post-ordering locality of motif graphs."""
    rng = np.random.default_rng(seed)
    half = deg // 2
    src = np.repeat(np.arange(n, dtype=np.int64), half)
    off = rng.integers(1, bandwidth, size=src.shape[0])
    dst = (src + off) % n
    s = np.concatenate([src, dst]).astype(np.int32)
    r = np.concatenate([dst, src]).astype(np.int32)
    w = np.ones(s.shape[0], dtype=np.float32)
    return s, r, w


def time_fn(fn, *args, iters=20, warmup=2, tag=""):
    import jax

    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    log(f"[{tag}] warmup+compile: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    log(f"[{tag}] median {np.median(times)*1e3:.3f} ms over {iters} iters; "
        f"all: {[round(t*1e3, 3) for t in times]}")
    return float(np.median(times))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
    from tpugraph.ops.pallas_spmm import bcsr_matvec
    from tpugraph.ops.message import spmm

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    log(f"platform: {platform}, device: {jax.devices()[0]}")

    if on_tpu:
        n, deg, bw, d = 65536, 32, 192, 128
    else:
        # CPU smoke config: the Pallas interpreter is orders of magnitude
        # slower, keep it tiny just to validate the harness end-to-end.
        n, deg, bw, d = 1024, 8, 192, 128
    s, r, w, = make_banded_graph(n, deg, bw)
    num_edges = s.shape[0]
    log(f"graph: {n} nodes, {num_edges} directed edges, feature dim {d}")

    m = bcsr_from_coo(s, r, w, n)
    m_t = bcsr_transpose_host(s, r, w, n)
    log(f"bcsr: {m.num_tiles} tiles of {m.block}x{m.block} "
        f"(density {num_edges / (m.num_tiles * m.block * m.block):.3f})")

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((m.num_nodes, d)).astype(np.float32)
    )

    from functools import partial

    interp = not on_tpu

    # BCSR passed as jit ARGUMENTS (closure constants cost ~150x dispatch
    # and can exceed the compile payload limit).
    @partial(jax.jit, static_argnames="interpret")
    def pallas_fwd_bwd_args(m, m_t, x, interpret=False):
        y, vjp = jax.vjp(lambda xx: bcsr_matvec(m, m_t, xx, interpret), x)
        (dx,) = vjp(y)
        return y, dx

    def pallas_fwd_bwd(x):
        return pallas_fwd_bwd_args(m, m_t, x, interp)

    s_d = jnp.asarray(s)
    r_d = jnp.asarray(r)
    w_d = jnp.asarray(w)
    n_pad = m.num_nodes
    x_coo = x

    @jax.jit
    def coo_fwd_bwd_args(s_a, r_a, w_a, x):
        def coo_matvec(xx):
            return spmm(s_a, r_a, w_a, xx, num_nodes=n_pad)

        y, vjp = jax.vjp(coo_matvec, x)
        (dx,) = vjp(y)
        return y, dx

    def coo_fwd_bwd(x):
        return coo_fwd_bwd_args(s_d, r_d, w_d, x)

    # correctness cross-check before timing.  NOTE: one single jitted
    # function — any eager op in this environment triggers a separate
    # remote compile costing minutes.
    @jax.jit
    def rel_err(yp, yc):
        return jnp.max(jnp.abs(yp - yc)) / (jnp.max(jnp.abs(yc)) + 1e-9)

    log("compiling pallas fwd+bwd...")
    t0 = time.perf_counter()
    yp, _ = pallas_fwd_bwd(x)
    import jax as _jax; _jax.block_until_ready(yp)
    log(f"pallas compile+first run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    yc, _ = coo_fwd_bwd(x_coo)
    _jax.block_until_ready(yc)
    log(f"coo compile+first run: {time.perf_counter()-t0:.1f}s")
    err = float(rel_err(yp, yc))
    log(f"pallas vs coo max relative err: {err:.2e}")
    # MXU matmuls run at TPU default precision (bf16 passes); the COO path
    # accumulates in exact f32 — ~1% relative difference is expected.
    assert err < 5e-2, "pallas kernel mismatch"

    iters = 10 if on_tpu else 3
    t_pallas = time_fn(pallas_fwd_bwd, x, iters=iters, tag="pallas")
    t_coo = time_fn(coo_fwd_bwd, x_coo, iters=iters, tag="coo")

    # fwd+bwd touches each edge twice (A and A^T)
    pallas_eps = 2 * num_edges / t_pallas
    coo_eps = 2 * num_edges / t_coo
    log(f"pallas: {t_pallas*1e3:.3f} ms/iter -> {pallas_eps:.3e} edges/s")
    log(f"xla coo: {t_coo*1e3:.3f} ms/iter -> {coo_eps:.3e} edges/s")

    print(
        json.dumps(
            {
                "metric": "spmm_fwd_bwd_edges_per_s_per_chip",
                "value": pallas_eps,
                "unit": "edges/s",
                "vs_baseline": pallas_eps / coo_eps,
            }
        )
    )


if __name__ == "__main__":
    main()
