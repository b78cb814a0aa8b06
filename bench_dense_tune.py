"""Dense-tile BCSR kernel tuning on banded AND powerlaw graphs (r3).

Covers r3 VERDICT items (results recorded in BASELINE_MEASURED.md):
  * task 2 (bf16 contradiction): x-dtype x out-dtype matrix on banded
  * task 6 (packed v3, now deleted): v3 measured a TIE with v2
    (3.70 vs 3.69e9 banded, 4.10 vs 4.11e8 powerlaw) -> v2 kept
  * task 1 support: dense-tile block 128 vs 256 on powerlaw

Run alone (single TPU holder).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

from bench import (
    enable_compile_cache,
    log,
    make_banded_graph,
    make_powerlaw_graph,
)


def main() -> None:
    import jax

    enable_compile_cache()
    import jax.numpy as jnp

    from tpugraph.ops.bcsr import (
        bcsr_from_coo, choose_k_pack_counts, coo_tile_counts,
    )
    from tpugraph.ops.pallas_spmm import spmm_bcsr, spmm_bcsr_packed

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        n, deg, bw, d, K, reps = 65536, 32, 192, 128, 50, 3
    else:
        n, deg, bw, d, K, reps = 1024, 8, 64, 128, 2, 1
    interp = not on_tpu

    def chain_factory(kernel_kind, kp):
        def one(m, x, od):
            if kernel_kind == "plain":
                return spmm_bcsr(m, x, interpret=interp, out_dtype=od)
            return spmm_bcsr_packed(m, x, k_pack=kp, interpret=interp,
                                    out_dtype=od)

        @partial(jax.jit, static_argnames=("k", "od", "xd"))
        def chained(m, x, k, od, xd):
            def body(xc, _):
                y = one(m, xc, od).astype(xd)
                dx = one(m, y, od)
                dxf = dx.astype(jnp.float32)
                scale = jax.lax.rsqrt(jnp.mean(dxf * dxf) + 1e-9)
                return (dxf * scale).astype(xd), ()

            xf, _ = jax.lax.scan(body, x.astype(xd), None, length=k)
            return jnp.sum(xf.astype(jnp.float32))

        return chained

    def run(tag, fn, m, x, e, od, xd):
        try:
            t0 = time.perf_counter()
            out = fn(m, x, K, od, xd)
            out.block_until_ready()
            first = time.perf_counter() - t0
            cks = float(out)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(m, x, K, od, xd)
                out.block_until_ready()
                times.append(time.perf_counter() - t0)
            per = min(times) / K
            eps = 2 * e / per
            log(f"[{tag}] compile {first:.1f}s; {per*1e3:.3f} ms/iter = "
                f"{eps:.3e} edges/s (cks {cks:.4e})")
            return eps
        except Exception as ex:
            log(f"[{tag}] FAILED: {type(ex).__name__}: {str(ex)[:200]}")
            return None

    results = {}

    def bench_graph(gname, s, r, w):
        e = len(s)
        for block in (256, 128):
            cnt = coo_tile_counts(s, r, n, block=block, weights=w)
            kp = max(choose_k_pack_counts(cnt), 1)
            t0 = time.perf_counter()
            m = bcsr_from_coo(s, r, w, n, block=block,
                              tile_dtype=jnp.bfloat16,
                              pad_rows_to=kp if kp > 1 else None)
            jax.block_until_ready(m.tiles)
            pack_s = time.perf_counter() - t0
            log(f"{gname} b{block}: {m.num_tiles} tiles, k_pack {kp}, "
                f"pack+upload {pack_s:.1f}s")
            x = jnp.asarray(np.random.default_rng(1).standard_normal(
                (m.num_nodes, d)).astype(np.float32))
            variants = [
                ("v2-xf32-of32", "v2", jnp.float32, jnp.float32),
                ("v2-xbf16-of32", "v2", jnp.float32, jnp.bfloat16),
                ("v2-xbf16-obf16", "v2", jnp.bfloat16, jnp.bfloat16),
            ]
            if kp < 2:
                variants = [(t.replace("v2", "plain"), "plain", od, xd)
                            for (t, k_, od, xd) in variants if k_ == "v2"]
            for (vtag, kind, od, xd) in variants:
                fn = chain_factory(kind, kp)
                eps = run(f"{gname}-b{block}-{vtag}", fn, m, x, e, od, xd)
                if eps:
                    results[f"{gname}_b{block}_{vtag}"] = eps

    s, r, w = make_banded_graph(n, deg, bw)
    bench_graph("banded", s, r, w)
    s, r, w = make_powerlaw_graph(n, deg)
    bench_graph("powerlaw", s, r, w)

    best_b = {k: v for k, v in results.items() if k.startswith("banded")}
    best_p = {k: v for k, v in results.items() if k.startswith("powerlaw")}
    print(json.dumps({
        "results": results,
        "best_banded": max(best_b, key=best_b.get) if best_b else None,
        "best_powerlaw": max(best_p, key=best_p.get) if best_p else None,
    }))


if __name__ == "__main__":
    main()
