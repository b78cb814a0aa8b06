"""Resident-kernel overhead attribution (VERDICT r3 items 3+4).

BENCH_r03: the VMEM-resident stacked kernel runs the powerlaw chain at
4.49 ms/iter vs a 3.58 ms/iter dense-MXU floor (78% of peak), and the
banded chain at 53% HBM — in both cases ~2x of SOMETHING sits between
the measured time and the binding roofline, unattributed.  This script
times stripped-down kernel variants that each remove one candidate cost
so the gap can be attributed by subtraction:

  full       — the shipped kernel (baseline)
  fixedrow   — accumulate to a FIXED row offset (removes the
               dynamic-offset cost of the out RMW, keeps the add)
  storeonly  — plain store, no read-modify-write (removes the out read)
  nodot      — skip the MXU dot, accumulate xv directly (removes MXU)
  dmaonly    — touch the tile, write a fixed block (pure stream floor)
  sorted     — row-major sorted tiles + scratch accumulator flushed
               once per row RUN (the candidate fix: turns ~T dynamic
               RMWs into ~num_row_blocks flushes)

All variants keep the identical tile stream, grid, and scalar prefetch
so the subtraction isolates exactly one term.  Results drive the r4
kernel fix; recorded in BASELINE_MEASURED.md.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variant_kernel_factory(k_pack, block, stack, mode):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(rows_ref, col_ref, tiles_ref, x_ref, out_ref, *scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            if mode == "sorted":
                acc, cur = scratch
                acc[:] = jnp.zeros_like(acc)
                cur[0] = rows_ref[0]

        base = i * k_pack
        for j in range(k_pack):
            tile = tiles_ref[j]
            if tile.dtype == jnp.int8:
                tile = tile.astype(jnp.bfloat16)
            xv = x_ref[pl.ds(col_ref[base + j] * block, block), :]
            if xv.dtype != tile.dtype:
                xv = xv.astype(tile.dtype)
            if mode == "dmaonly":
                # touch the tile so the stream is not dead, no dot/RMW
                out_ref[0:block, 0:1] = (
                    tile[:, 0:1].astype(jnp.float32)
                    + xv[:, 0:1].astype(jnp.float32)
                )
                continue
            if mode == "nodot":
                acc_v = (xv.astype(jnp.float32)
                         + tile[0:1, 0:1].astype(jnp.float32))
            else:
                acc_v = jnp.dot(tile, xv,
                                preferred_element_type=jnp.float32)
            for s in range(stack):
                r0 = rows_ref[(base + j) * stack + s]
                av = acc_v[s * block:(s + 1) * block]
                if mode == "fixedrow":
                    out_ref[0:block, :] += av
                elif mode == "storeonly":
                    out_ref[pl.ds(r0 * block, block), :] = av
                elif mode == "sorted":
                    acc, cur = scratch

                    @pl.when(r0 != cur[0])
                    def _(av=av, r0=r0):
                        out_ref[pl.ds(cur[0] * block, block), :] += acc[:]
                        acc[:] = jnp.zeros_like(acc)
                        cur[0] = r0

                    acc[:] += av
                else:  # full
                    out_ref[pl.ds(r0 * block, block), :] += av

        if mode == "sorted":
            acc, cur = scratch

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[pl.ds(cur[0] * block, block), :] += acc[:]

    return kernel


def run_variant(st, x, mode, k_pack, d, reps=3, K=50):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, n_out, b, t = st.num_nodes, st.num_row_nodes, st.block, st.num_tiles
    stack = st.stack

    scratch = []
    if mode == "sorted":
        scratch = [pltpu.VMEM((b, d), jnp.float32),
                   pltpu.SMEM((1,), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // k_pack,),
        in_specs=[
            pl.BlockSpec((k_pack, stack * b, b),
                         lambda i, rows, col: (i, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
        scratch_shapes=scratch,
    )
    tile_b = jnp.dtype(st.tiles.dtype).itemsize

    def one(xc):
        return pl.pallas_call(
            _variant_kernel_factory(k_pack, b, stack, mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, d), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * t * stack * b * b * d,
                bytes_accessed=t * stack * b * b * tile_b
                + n * d * 2 + n_out * d * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2**20
            ),
        )(st.rows, st.col_blk, st.tiles, xc)

    @partial(jax.jit, static_argnames=("k",))
    def chained(st, x, k):
        def body(xc, _):
            y = one(xc).astype(jnp.bfloat16)
            dx = one(y)
            scale = jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return (dx * scale).astype(jnp.bfloat16), ()

        xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    t0 = time.perf_counter()
    outv = chained(st, x, K)
    outv.block_until_ready()
    first = time.perf_counter() - t0
    cks = float(outv)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outv = chained(st, x, K)
        outv.block_until_ready()
        times.append(time.perf_counter() - t0)
    per_iter = min(times) / K
    log(f"[{mode}] compile+first {first:.1f}s; {per_iter * 1e3:.3f} ms/iter"
        f" (checksum {cks:.3e})")
    return per_iter, cks


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import (
        enable_compile_cache,
        make_banded_graph,
        make_powerlaw_graph,
    )
    from tpugraph.ops.bcsr import bcsr_from_coo
    from tpugraph.ops.pallas_resident import stack_bcsr

    enable_compile_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"platform: {jax.devices()[0].platform}")
    if on_tpu:
        n, deg, d, block, kp = 65536, 32, 128, 256, 64
    else:
        n, deg, d, block, kp = 1024, 8, 128, 128, 4

    # chain-body overhead floor (no kernels): the two bf16 casts +
    # renormalize the chain harness adds per iteration
    from functools import partial as _p

    @_p(jax.jit, static_argnames="k")
    def chained_empty(x, k):
        def body(xc, _):
            dx = xc.astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-9)
            return (dx * scale).astype(jnp.bfloat16), ()

        xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
        return jnp.sum(xf.astype(jnp.float32))

    out = {"metric": "resident_kernel_overhead_attribution",
           "value": 0.0, "unit": "ms/iter", "vs_baseline": 1.0}
    import dataclasses

    graphs = sys.argv[1:] or ["powerlaw", "banded"]
    for gname in graphs:
        if gname.startswith("powerlaw"):
            s, r, w = make_powerlaw_graph(n, deg)
            # powerlaw kernel compiles take ~45 min each through the
            # remote tunnel (graph-size-dependent; banded takes ~20 s),
            # so powerlaw variants are invoked one at a time:
            # `python bench_resident_diag2.py powerlaw:<kp>`
            kps = ((int(gname.split(":")[1]),) if ":" in gname
                   else (256,)) if on_tpu else (4,)
            gname = "powerlaw"
        else:
            s, r, w = make_banded_graph(n, deg, 192)
            kps = (32, 64, 128, 256, 384) if on_tpu else (4,)
        e = len(s)
        m_host = bcsr_from_coo(s, r, w, n, block=block,
                               tile_dtype=jnp.int8, device=False)
        x = None
        res = {}
        for kpv in kps:
            st = stack_bcsr(m_host, stack=1, k_pack=kpv)
            if x is None:
                x = jnp.asarray(
                    np.random.default_rng(2).standard_normal(
                        (st.num_nodes, d)).astype(np.float32)
                )
                t0 = time.perf_counter()
                o = chained_empty(x, 50)
                o.block_until_ready()
                t0 = time.perf_counter()
                o = chained_empty(x, 50)
                o.block_until_ready()
                res["empty_chain"] = round(
                    (time.perf_counter() - t0) / 50 * 1e3, 3)
                log(f"[empty-chain] {res['empty_chain']} ms/iter")
            if gname == "powerlaw" and on_tpu:
                modes = ("full",)  # each compile ~45 min; one at a time
            elif kpv == kps[-1] and on_tpu:
                modes = ("full", "dmaonly", "sorted", "storeonly", "nodot")
            else:
                modes = ("full", "dmaonly")
            for mode in modes:
                try:
                    per_iter, cks = run_variant(st, x, mode, kpv, d)
                    res[f"{mode}_kp{kpv}"] = round(per_iter * 1e3, 3)
                    if mode in ("full", "sorted"):
                        res[f"{mode}_kp{kpv}_edges_per_s"] = round(
                            2 * e / per_iter)
                except Exception as exc:  # noqa: BLE001
                    log(f"[{mode} kp{kpv}] FAILED: {exc}")
                    res[f"{mode}_kp{kpv}"] = None
        out[gname] = res
        out[gname + "_edges"] = e
        t_tiles = ((m_host.num_tiles + kps[0] - 1) // kps[0]) * kps[0]
        dense_ms = 2 * 2 * t_tiles * block * block * d / 197e12 * 1e3
        hbm_ms = 2 * (t_tiles * block * block
                      + n * d * 2 + n * d * 4) / 819e9 * 1e3
        out[gname + "_floor_ms"] = {"mxu_dense": round(dense_ms, 3),
                                    "hbm": round(hbm_ms, 3)}
        log(f"{gname}: floors mxu={dense_ms:.3f} hbm={hbm_ms:.3f} ms/iter; "
            f"{res}")
    pl_best = [v for k, v in out["powerlaw"].items()
               if k.startswith("full_kp") and isinstance(v, float)]
    if pl_best:
        out["value"] = min(pl_best)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
