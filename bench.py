"""Headline benchmark: SpMM fwd+bwd edges/s/chip.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the hot op of every GNN layer — sparse neighborhood
aggregation ``y = A @ x`` plus its backward ``dx = A^T @ dy`` — on a
locality-rich graph (banded random edges, the structure of the
framework's motif/PPI graphs after node ordering).  The Pallas BCSR
kernel (``tpugraph/ops/pallas_spmm.py``) is measured against the XLA
gather/``segment_sum`` COO path on the same chip; the reference
implementation's dense ``[N, N] @ [N, D]`` matmul (models.py:70) cannot
even materialize at this graph size.

Measurement methodology: ONE jitted ``lax.scan`` chaining K dependent
fwd+bwd pairs entirely on device, fenced by a scalar checksum.  Host-side
per-call timing on this platform is contaminated by dispatch/relay
overhead (measured 29 ms/call vs 2.1 ms true device time) and async
fencing artifacts (0.12 ms "timings" exceeding HBM bandwidth); the
chained scan is immune to both.  Cross-path checksum equality guards
correctness.

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
    """Per-call timing with block_until_ready fencing (kept for host-side
    comparisons; the headline numbers use the chained-scan method)."""
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
    log(f"[{tag}] median {np.median(times)*1e3:.3f} ms over {iters} iters")
    return float(np.median(times))


def enable_compile_cache() -> None:
    """Persistent compilation cache (validated against this platform's
    remote-compile tunnel: executables serialize/deserialize cleanly).
    A pre-warmed cache turns the tuned config's multi-minute cold compile
    into a sub-second load, so the bench fits any time budget."""
    import os

    import jax

    cache_dir = os.environ.get(
        "TPUGRAPH_COMPILE_CACHE", "/root/repo/.jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        log(f"compile cache unavailable: {e}")


def main() -> None:
    import jax

    enable_compile_cache()
    import jax.numpy as jnp

    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
    from tpugraph.ops.pallas_spmm import spmm_bcsr
    from tpugraph.ops.message import spmm

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    log(f"platform: {platform}, device: {jax.devices()[0]}")

    import os

    if on_tpu:
        n, deg, bw, d, K, reps = 65536, 32, 192, 128, 50, 3
        # Default: tuned 256-block bf16 config (3.9e9 edges/s, measured).
        # Its multi-minute cold compile is absorbed by the persistent
        # compilation cache (pre-warmed in .jax_cache — loads in <1 s).
        # TPUGRAPH_BENCH_TUNED=0 opts into the conservative 128/f32
        # config for a cold-cache machine with a tight time budget.
        if os.environ.get("TPUGRAPH_BENCH_TUNED") == "0":
            block, tile_dtype = 128, "float32"
        else:
            block, tile_dtype = 256, "bfloat16"
    else:
        # CPU smoke config: the Pallas interpreter is orders of magnitude
        # slower; keep it tiny just to validate the harness end-to-end.
        n, deg, bw, d, K, reps = 1024, 8, 192, 128, 2, 1
        block, tile_dtype = 128, "float32"
    s, r, w = make_banded_graph(n, deg, bw)
    num_edges = s.shape[0]
    log(f"graph: {n} nodes, {num_edges} directed edges, feature dim {d}")

    import dataclasses

    m = bcsr_from_coo(s, r, w, n, block=block)
    m_t = bcsr_transpose_host(s, r, w, n, block=block)
    if tile_dtype != "float32":
        dt = jnp.dtype(tile_dtype)
        m = dataclasses.replace(m, tiles=m.tiles.astype(dt))
        m_t = dataclasses.replace(m_t, tiles=m_t.tiles.astype(dt))
    log(f"bcsr: {m.num_tiles} tiles of {m.block}x{m.block} "
        f"(density {num_edges / (m.num_tiles * m.block * m.block):.3f})")

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((m.num_nodes, d)).astype(np.float32)
    )
    interp = not on_tpu

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def chained_pallas(m, m_t, x, k):
        def body(xc, _):
            y = spmm_bcsr(m, xc, interpret=interp)
            dx = spmm_bcsr(m_t, y, interpret=interp)
            xc = dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return xc, ()

        xf, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(xf)

    sd, rd, wd = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)

    @partial(jax.jit, static_argnames=("k",))
    def chained_coo(sd, rd, wd, x, k):
        def body(xc, _):
            y = spmm(sd, rd, wd, xc, num_nodes=x.shape[0])
            dx = spmm(rd, sd, wd, y, num_nodes=x.shape[0])
            xc = dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return xc, ()

        xf, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(xf)

    def run(tag, fn, args):
        t0 = time.perf_counter()
        out = fn(*args, k=K)
        out.block_until_ready()
        first = time.perf_counter() - t0
        checksum = float(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args, k=K)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        per_iter = min(times) / K
        log(f"[{tag}] compile+first {first:.1f}s; {min(times)*1e3:.1f} ms / "
            f"{K} chained fwd+bwd = {per_iter*1e3:.3f} ms/iter "
            f"(checksum {checksum:.4e})")
        return per_iter, checksum

    t_pallas, cks_p = run("pallas", chained_pallas, (m, m_t, x))
    t_coo, cks_c = run("coo", chained_coo, (sd, rd, wd, x))

    # correctness guard: after K renormalized iterations both paths must
    # land on (numerically) the same checksum.
    rel = abs(cks_p - cks_c) / (abs(cks_c) + 1e-9)
    log(f"checksum rel diff: {rel:.2e}")
    assert rel < 5e-2, "pallas/coo divergence"

    pallas_eps = 2 * num_edges / t_pallas
    coo_eps = 2 * num_edges / t_coo
    log(f"pallas: {pallas_eps:.3e} edges/s ; coo: {coo_eps:.3e} edges/s")

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
