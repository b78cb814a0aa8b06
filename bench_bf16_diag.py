"""Task-2 diagnosis: why was the packed bf16 chain (1.429 ms/iter) slower
than the f32 chain (0.928 ms) on the banded graph in BENCH_r02?

The bf16 chain differs from the f32 chain in three ways:
  (a) x resident in HBM as bf16  -> manual-DMA gather traffic halves
  (b) out_dtype=bf16             -> cast-factory kernel: f32 VMEM acc
                                    scratch + downcast store per row block
  (c) scan body renormalizes in f32 and casts back (VPU, negligible)

This bench isolates (a) from (b) by running all four combinations of
{x dtype} x {out dtype} on the banded chain.  Outcome drives either a
fix (e.g. keep bf16 x but f32 out, casting in the scan body) or a
corrected claim in ops/pallas_spmm.py + CLAUDE.md.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

from bench import enable_compile_cache, log, make_banded_graph


def main() -> None:
    import jax

    enable_compile_cache()
    import jax.numpy as jnp

    from tpugraph.ops.bcsr import (
        bcsr_from_coo, choose_k_pack_counts, coo_tile_counts,
    )
    from tpugraph.ops.pallas_spmm import spmm_bcsr_packed

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        n, deg, bw, d, K, reps = 65536, 32, 192, 128, 50, 3
        block = 256
    else:
        n, deg, bw, d, K, reps = 1024, 8, 192, 128, 2, 1
        block = 128
    interp = not on_tpu
    s, r, w = make_banded_graph(n, deg, bw)
    e = len(s)
    cnt = coo_tile_counts(s, r, n, block=block, weights=w)
    kp = choose_k_pack_counts(cnt)
    m = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=jnp.bfloat16,
                      pad_rows_to=kp if kp > 1 else None)
    kp = max(kp, 1)
    log(f"banded: {e} edges, {m.num_tiles} tiles, k_pack {kp}")

    @partial(jax.jit, static_argnames=("k", "od", "xd"))
    def chained(m, x, k, od, xd):
        def body(xc, _):
            y = spmm_bcsr_packed(m, xc, k_pack=kp, interpret=interp,
                                 out_dtype=od)
            y = y.astype(xd)
            dx = spmm_bcsr_packed(m, y, k_pack=kp, interpret=interp,
                                  out_dtype=od)
            dxf = dx.astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(dxf * dxf) + 1e-9)
            return (dxf * scale).astype(xd), ()

        xf, _ = jax.lax.scan(body, x.astype(xd), None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (m.num_nodes, d)).astype(np.float32)
    )

    res = {}
    for (tag, od, xd) in [
        ("xf32_of32", jnp.float32, jnp.float32),
        ("xbf16_of32", jnp.float32, jnp.bfloat16),
        ("xf32_obf16", jnp.bfloat16, jnp.float32),
        ("xbf16_obf16", jnp.bfloat16, jnp.bfloat16),
    ]:
        t0 = time.perf_counter()
        out = chained(m, x, K, od, xd)
        out.block_until_ready()
        first = time.perf_counter() - t0
        cks = float(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = chained(m, x, K, od, xd)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        per = min(times) / K
        eps = 2 * e / per
        log(f"[{tag}] compile {first:.1f}s; {per*1e3:.3f} ms/iter "
            f"= {eps:.3e} edges/s (cks {cks:.4e})")
        res[tag] = {"ms_per_iter": per * 1e3, "edges_per_s": eps}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
