"""VMEM-resident SpMM kernel tuning (r3 perf push, VERDICT task 1).

Measures `ops/pallas_resident.py` (x + out VMEM-resident, column-stacked
tiles) against the r3 streaming-kernel numbers on the SAME graphs:
powerlaw 4.11e8 edges/s (dense-tile packed xbf16), banded 4.59e9.

Sweeps stack x tile-dtype x k_pack; each variant is one remote-tunnel
Pallas compile (~5-8 min cold), so run in background and keep the list
tight.  Run alone (single TPU holder).
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

    from tpugraph.ops.bcsr import bcsr_from_coo
    from tpugraph.ops.pallas_resident import (
        spmm_stacked_resident, stack_bcsr,
    )
    from tpugraph.ops.message import spmm

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        n, deg, bw, d, K, reps = 65536, 32, 192, 128, 50, 3
    else:
        n, deg, bw, d, K, reps = 1024, 8, 64, 128, 2, 1
    interp = not on_tpu

    @partial(jax.jit, static_argnames=("k", "kp"))
    def chained_resident(st, x, k, kp):
        def body(xc, _):
            y = spmm_stacked_resident(st, xc, k_pack=kp, interpret=interp)
            y = y.astype(jnp.bfloat16)
            dx = spmm_stacked_resident(st, y, k_pack=kp, interpret=interp)
            scale = jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return (dx * scale).astype(jnp.bfloat16), ()

        xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    @partial(jax.jit, static_argnames=("k",))
    def chained_coo(sd, rd, wd, x, k):
        def body(xc, _):
            y = spmm(sd, rd, wd, xc, num_nodes=x.shape[0])
            dx = spmm(rd, sd, wd, y, num_nodes=x.shape[0])
            xc = dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return xc, ()

        xf, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(xf)

    def run(tag, fn, args, e):
        try:
            t0 = time.perf_counter()
            out = fn(*args, k=K)
            out.block_until_ready()
            first = time.perf_counter() - t0
            cks = float(out)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(*args, k=K)
                out.block_until_ready()
                times.append(time.perf_counter() - t0)
            per = min(times) / K
            eps = 2 * e / per
            log(f"[{tag}] compile {first:.1f}s; {per*1e3:.3f} ms/iter = "
                f"{eps:.3e} edges/s (cks {cks:.4e})")
            return eps, cks
        except Exception as ex:
            log(f"[{tag}] FAILED: {type(ex).__name__}: {str(ex)[:300]}")
            return None, None

    results = {}

    def bench_graph(gname, s, r, w, variants):
        e = len(s)
        block = 256
        sd, rd, wd = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
            (((n + block - 1) // block) * block, d)).astype(np.float32))
        _, cks_coo = run(f"{gname}-coo", chained_coo, (sd, rd, wd, x0), e)
        packed = {}
        for (stack, dtname, kp) in variants:
            dt = {"bf16": jnp.bfloat16, "int8": jnp.int8}[dtname]
            key = (dtname, stack, kp)
            if key not in packed:
                t0 = time.perf_counter()
                m = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=dt,
                                  device=False)
                st = stack_bcsr(m, stack=stack, k_pack=kp)
                jax.block_until_ready(st.tiles)
                packed[key] = (st, time.perf_counter() - t0)
            st, pack_s = packed[key]
            tag = f"{gname}-res-s{stack}-{dtname}-kp{kp}"
            log(f"[{tag}] {st.num_tiles} stacks of {stack}x{block}^2, "
                f"pack+stack+upload {pack_s:.1f}s")
            eps, cks = run(tag, partial(chained_resident, kp=kp),
                           (st, x0), e)
            if eps:
                rel = abs(cks - cks_coo) / (abs(cks_coo) + 1e-9)
                log(f"[{tag}] checksum rel vs coo: {rel:.2e}")
                results[tag] = {"edges_per_s": eps, "cks_rel": rel,
                                "pack_s": round(pack_s, 1)}

    s, r, w = make_powerlaw_graph(n, deg)
    deg_in = np.bincount(r, minlength=n)
    perm = np.argsort(-deg_in, kind="stable")
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    s, r = inv[s].astype(np.int32), inv[r].astype(np.int32)  # degsort
    bench_graph("powerlaw", s, r, w, [
        (2, "int8", 4),
        (1, "int8", 8),
        (4, "int8", 2),
        (2, "bf16", 4),
        (2, "int8", 8),
    ])

    s, r, w = make_banded_graph(n, deg, bw)
    bench_graph("banded", s, r, w, [
        (2, "int8", 4),
        (2, "bf16", 4),
    ])

    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
