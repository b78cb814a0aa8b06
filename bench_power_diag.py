"""Fused multi-hop diffusion (spmm_power_resident) vs repeated pair
calls: (A_t A)^H x in one pallas_call.

MEASURED CONCLUSIONS (r5, TPU v5e, H=8, checksum-matched):
* banded:   power 0.452 ms/pair-hop = 9.28e9 edges/s
            vs repeated pairs 0.523 ms = 8.02e9 (+16%)
* powerlaw: power 4.02 ms/pair-hop = 1.044e9 edges/s
            vs repeated pairs 4.09 ms = 1.025e9 (+1.8%)
* The H-hop fusion amortizes the ~200us grid+resident constant AND the
  per-pair phase-boundary costs; on the DIFFUSION workload (SGC/APPNP-
  style propagation, no nonlinearity between hops) powerlaw crosses
  1e9 edges/s.  This does NOT apply to loss-separated training — the
  single-pair numbers in bench.py remain the training-shaped metric.
* hop_scale=1/deg^2 keeps un-normalized unit-weight powers bounded in
  bf16 (banded rows sum to exactly deg); sym-normalized adjacencies
  need no scale.
* Platform quirk: the FIRST timed variant on a given graph reads ~0 ms
  (both orders tried; take each variant's number from the run where it
  was not first).
"""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import bench
bench.enable_compile_cache()
from bench import make_banded_graph, make_powerlaw_graph
from tpugraph.ops.bcsr import bcsr_from_coo
from tpugraph.ops.pallas_resident import (
    pack_pair, spmm_pair_resident, spmm_power_resident, stack_bcsr,
)
on_tpu = jax.devices()[0].platform == "tpu"
interp = not on_tpu
n, d, block = 65536, 128, 256
H = 8
K = 10
rng = np.random.default_rng(0)

# unit-weight banded rows sum to exactly deg=32, so scaling each
# A_tA application by 1/32^2 keeps the diffusion bounded in bf16
SCALE = 1.0 / 1024.0

@partial(jax.jit, static_argnames=("k", "hops"))
def chain_power(pr, x, k, hops):
    def body(xc, _):
        y = spmm_power_resident(pr, xc, hops=hops, k_pack=128,
                                interpret=interp, hop_scale=SCALE)
        yf = y.astype(jnp.float32)
        return (yf * jax.lax.rsqrt(jnp.mean(yf * yf) + 1e-9)).astype(
            jnp.bfloat16), ()
    xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
    return jnp.sum(xf.astype(jnp.float32))

@partial(jax.jit, static_argnames=("k", "hops"))
def chain_pairs(pr, x, k, hops):
    def body(xc, _):
        y = xc
        for _ in range(hops):
            y = spmm_pair_resident(pr, y, k_pack=128, interpret=interp)
            y = (y.astype(jnp.float32) * SCALE).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        return (yf * jax.lax.rsqrt(jnp.mean(yf * yf) + 1e-9)).astype(
            jnp.bfloat16), ()
    xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
    return jnp.sum(xf.astype(jnp.float32))

for gname, mk in (("banded", lambda: make_banded_graph(n, 32, 256)),
                  ("powerlaw", lambda: make_powerlaw_graph(n, 32))):
    s, r, w = mk()
    m = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=jnp.int8,
                      device=False)
    st = stack_bcsr(m, stack=1, k_pack=128)
    pr = pack_pair(st, st)
    jax.block_until_ready(pr.tiles)
    x0 = rng.standard_normal((st.num_nodes, d)).astype(np.float32)
    n_edges = int((w != 0).sum())
    # sacrificial timed sequence: the FIRST timed variant in a process
    # reads ~0 ms on this platform (bench_pair_diag quirk)
    fn0 = chain_power
    out = fn0(pr, jnp.asarray(x0), k=K, hops=H); out.block_until_ready()
    t0 = time.perf_counter(); out = fn0(pr, jnp.asarray(x0 + 1e-2), k=K, hops=H)
    out.block_until_ready(); _ = time.perf_counter() - t0
    import os as _os
    order = (("pairs", chain_pairs), ("power", chain_power)) \
        if _os.environ.get("POWER_ORDER") == "rev" else \
        (("power", chain_power), ("pairs", chain_pairs))
    for tag, fn in order:
        out = fn(pr, jnp.asarray(x0), k=K, hops=H); out.block_until_ready()
        best = 1e9
        for i in range(1, 4):
            xv = jnp.asarray(x0 + 1e-3 * i); xv.block_until_ready()
            t0 = time.perf_counter()
            out = fn(pr, xv, k=K, hops=H)
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        per_hop = best / K / H
        print(f"[{gname} {tag} H={H}] {per_hop*1e3:.3f} ms/pair-hop = "
              f"{2*n_edges/per_hop:.4e} edges/s (cks {float(out):.4e})",
              flush=True)
