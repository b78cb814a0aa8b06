"""TPU tuning run for the edge-packet SpMM kernel (round-3 perf work).

Measures the packet kernel against the dense-tile BCSR kernel on the
Chung-Lu power-law bench graph across (block_r, block_c, K) geometries,
chain dtypes, and x placement (HBM-window DMA vs VMEM-resident), using
the device-side chained-scan methodology of bench.py.  Results drive
the default geometry + the density threshold for auto-selecting packet
vs dense-tile format.

Run alone (single TPU holder), ideally backgrounded:
  timeout 3500 python bench_packets_tune.py 2>&1 | tee /tmp/tune_packets.log
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

from bench import (
    enable_compile_cache,
    log,
    make_powerlaw_graph,
)


def main() -> None:
    import jax

    enable_compile_cache()
    import jax.numpy as jnp

    from tpugraph.ops.packets import pack_edges, packet_stats
    from tpugraph.ops.pallas_packets import spmm_packets

    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"platform: {jax.devices()[0].platform}")

    if on_tpu:
        n, deg, d, K, reps = 65536, 32, 128, 50, 3
    else:
        n, deg, d, K, reps = 2048, 8, 128, 2, 1

    s, r, w = make_powerlaw_graph(n, deg)
    e = len(s)
    log(f"powerlaw: {n} nodes, {e} edges")
    interp = not on_tpu

    @partial(jax.jit, static_argnames=("k", "cd", "od", "pk"))
    def chained(p, p_t, x, k, cd, od, pk):
        def body(xc, _):
            y = spmm_packets(p, xc, interpret=interp, compute_dtype=cd,
                             out_dtype=od, pk=pk)
            dx = spmm_packets(p_t, y, interpret=interp, compute_dtype=cd,
                              out_dtype=od, pk=pk)
            dxf = dx.astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(dxf * dxf) + 1e-9)
            return (dxf * scale).astype(x.dtype), ()

        xf, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    def run(tag, fn, args):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        first = time.perf_counter() - t0
        cks = float(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        per_iter = min(times) / K
        eps = 2 * e / per_iter
        log(f"[{tag}] compile+first {first:.1f}s; {per_iter*1e3:.3f} ms/iter "
            f"= {eps:.3e} edges/s (checksum {cks:.4e})")
        return per_iter, eps, cks

    results = {}
    # (br, bc, K, pk, variants); variant = (tag, x_dtype, out_dtype)
    V_F32 = ("f32x", jnp.float32, jnp.float32)
    V_BF16 = ("bf16x", jnp.bfloat16, jnp.bfloat16)
    configs = [
        (512, 256, 128, 8, [V_BF16]),
        (256, 256, 128, 8, [V_BF16]),
        (256, 256, 64, 8, [V_BF16]),
        (256, 256, 64, 16, [V_BF16]),
        (512, 256, 64, 16, [V_BF16]),
        (256, 256, 32, 16, [V_BF16]),
        (256, 256, 32, 32, [V_BF16]),
    ]
    for (br, bc, kk, pkm, variants) in configs:
        t0 = time.perf_counter()
        p = pack_edges(s, r, w, n, block_r=br, block_c=bc, k=kk,
                       pk_multiple=pkm)
        pack_s = time.perf_counter() - t0
        st = packet_stats(p, e)
        log(f"cfg ({br},{bc},K={kk},pk={pkm}): {st['packets']} packets, "
            f"occ {st['slot_occupancy']:.2f}, pack {pack_s:.1f}s")
        x32 = jnp.asarray(
            np.random.default_rng(1)
            .standard_normal((p.num_nodes, d))
            .astype(np.float32)
        )
        for (vtag, xdt, odt) in variants:
            name = f"{br}x{bc}k{kk}pk{pkm}_{vtag}"
            try:
                _, eps, cks = run(
                    f"pkt-{name}",
                    partial(chained, k=K, cd=jnp.bfloat16, od=odt, pk=pkm),
                    (p, p, x32.astype(xdt)),
                )
                results[name] = eps
            except Exception as ex:
                log(f"cfg {name} FAILED: {type(ex).__name__}: "
                    f"{str(ex)[:300]}")

    best = max(results, key=results.get) if results else None
    print(json.dumps({"results": results, "best": best,
                      "best_edges_per_s": results.get(best)}))


if __name__ == "__main__":
    main()
