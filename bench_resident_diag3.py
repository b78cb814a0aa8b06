"""Resident-kernel fixed-cost discrimination (follow-up to diag2).

diag2 established: banded resident time is kp-invariant (0.85-0.99
ms/iter for 24 -> 2 grid steps), dmaonly ~= full (dot + RMW hidden), and
the chain body is free — leaving a fixed ~0.36 ms/SpMM unattributed on
top of the ~0.06 ms tile stream.  Two discriminators:

  scratchacc — f32 accumulator in persistent VMEM scratch, bf16 out
               operand written once in the last step: halves the final
               writeback.  If the fixed cost is HBM writeback at a slow
               effective rate, this moves it.
  smalln     — same kernel at n=16384 (x 4.2 MB, out 8.4 MB): if the
               fixed cost scales with the resident buffer size it's
               buffer staging; if it stays ~0.36 ms it's a per-call
               constant.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel_factory(k_pack, block, mode):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(rows_ref, col_ref, tiles_ref, x_ref, out_ref, *scratch):
        i = pl.program_id(0)
        acc = scratch[0] if mode == "scratchacc" else out_ref

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        base = i * k_pack
        for j in range(k_pack):
            tile = tiles_ref[j].astype(jnp.bfloat16)
            xv = x_ref[pl.ds(col_ref[base + j] * block, block), :]
            if xv.dtype != tile.dtype:
                xv = xv.astype(tile.dtype)
            r0 = rows_ref[base + j]
            acc[pl.ds(r0 * block, block), :] += jnp.dot(
                tile, xv, preferred_element_type=jnp.float32
            )

        if mode == "scratchacc":
            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc[:].astype(jnp.bfloat16)

    return kernel


def run_cfg(st, x, mode, k_pack, d, K=50, reps=3,
            vmem_limit=110 * 2**20):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, n_out, b, t = st.num_nodes, st.num_row_nodes, st.block, st.num_tiles
    out_dtype = jnp.bfloat16 if mode == "scratchacc" else jnp.float32
    scratch = ([pltpu.VMEM((n_out, d), jnp.float32)]
               if mode == "scratchacc" else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // k_pack,),
        in_specs=[
            pl.BlockSpec((k_pack, b, b), lambda i, rows, col: (i, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=scratch,
    )

    def one(xc):
        return pl.pallas_call(
            _kernel_factory(k_pack, b, mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, d), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * t * b * b * d,
                bytes_accessed=t * b * b + n * d * 2 + n_out * d * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit
            ),
        )(st.rows, st.col_blk, st.tiles, xc)

    @partial(jax.jit, static_argnames="k")
    def chained(st, x, k):
        def body(xc, _):
            y = one(xc)
            y = y.astype(jnp.bfloat16)
            dx = one(y).astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return (dx * scale).astype(jnp.bfloat16), ()

        xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    t0 = time.perf_counter()
    o = chained(st, x, K)
    o.block_until_ready()
    first = time.perf_counter() - t0
    cks = float(o)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = chained(st, x, K)
        o.block_until_ready()
        times.append(time.perf_counter() - t0)
    per = min(times) / K
    log(f"[{mode}] compile+first {first:.1f}s; {per * 1e3:.3f} ms/iter "
        f"(checksum {cks:.3e})")
    return per


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import enable_compile_cache, make_banded_graph
    from tpugraph.ops.bcsr import bcsr_from_coo
    from tpugraph.ops.pallas_resident import stack_bcsr

    enable_compile_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    d, block, kp = 128, 256, 64
    out = {"metric": "resident_fixed_cost_discrimination", "value": 0.0,
           "unit": "ms/iter", "vs_baseline": 1.0}
    for tag, n in (("n65536", 65536), ("n16384", 16384)):
        if not on_tpu:
            n, blockv, kpv = 512, 128, 4
        else:
            blockv, kpv = block, kp
        s, r, w = make_banded_graph(n, 32, 192)
        m = bcsr_from_coo(s, r, w, n, block=blockv, tile_dtype=jnp.int8,
                          device=False)
        st = stack_bcsr(m, stack=1, k_pack=kpv)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (st.num_nodes, d)).astype(np.float32))
        res = {}
        modes = ("full", "scratchacc") if tag == "n65536" else ("full",)
        for mode in modes:
            try:
                per = run_cfg(st, x, mode, kpv, d)
                res[mode] = round(per * 1e3, 3)
                res[f"{mode}_edges_per_s"] = round(2 * len(s) / per)
            except Exception as exc:  # noqa: BLE001
                log(f"[{tag} {mode}] FAILED: {exc}")
                res[mode] = None
        if tag == "n65536" and on_tpu:
            # does the per-call fixed cost scale with the requested VMEM
            # budget?  scratchacc buffers need ~75 MB; ask for exactly
            # that instead of the blanket 110 MB.
            try:
                per = run_cfg(st, x, "scratchacc", kpv, d,
                              vmem_limit=80 * 2**20)
                res["scratchacc_vmem80"] = round(per * 1e3, 3)
                log(f"[scratchacc vmem80] {res['scratchacc_vmem80']} "
                    f"ms/iter")
            except Exception as exc:  # noqa: BLE001
                log(f"[scratchacc vmem80] FAILED: {exc}")
        out[tag] = res
        if not on_tpu:
            break
    if out.get("n65536", {}).get("full"):
        out["value"] = out["n65536"]["full"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
