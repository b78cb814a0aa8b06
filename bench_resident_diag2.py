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
                acc_v = xv.astype(jnp.float32) + tile[0, 0]
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // k_pack,),
        in_specs=[
            pl.BlockSpec((k_pack, stack * b, b),
                         lambda i, rows, col: (i, 0, 0)),
            pl.BlockSpec((n, d), lambda i, rows, col: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out, d), lambda i, rows, col: (0, 0)),
    )
    scratch = []
    if mode == "sorted":
        scratch = [pltpu.VMEM((b, d), jnp.float32),
                   pltpu.SMEM((1,), jnp.int32)]

    def one(xc):
        return pl.pallas_call(
            _variant_kernel_factory(k_pack, b, stack, mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2**20
            ),
            scratch_shapes=scratch,
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

    out = {"metric": "resident_kernel_overhead_attribution",
           "value": 0.0, "unit": "ms/iter", "vs_baseline": 1.0}
    for gname in ("powerlaw", "banded"):
        if gname == "powerlaw":
            s, r, w = make_powerlaw_graph(n, deg)
        else:
            s, r, w = make_banded_graph(n, deg, 192)
        e = len(s)
        m_host = bcsr_from_coo(s, r, w, n, block=block,
                               tile_dtype=jnp.int8, device=False)
        st = stack_bcsr(m_host, stack=1, k_pack=kp)
        # row-major sorted copy for the 'sorted' variant
        order = np.lexsort((np.asarray(m_host.col_blk),
                            np.asarray(m_host.row_of)))
        import dataclasses

        m_sorted = dataclasses.replace(
            m_host,
            tiles=np.asarray(m_host.tiles)[order],
            col_blk=np.asarray(m_host.col_blk)[order],
            row_of=np.asarray(m_host.row_of)[order],
        )
        st_sorted = stack_bcsr(m_sorted, stack=1, k_pack=kp)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (st.num_nodes, d)).astype(np.float32)
        )
        res = {}
        for mode in ("full", "sorted", "fixedrow", "storeonly", "nodot",
                     "dmaonly"):
            stv = st_sorted if mode == "sorted" else st
            try:
                per_iter, cks = run_variant(stv, x, mode, kp, d)
                res[mode] = round(per_iter * 1e3, 3)
                if mode in ("full", "sorted"):
                    res[f"{mode}_edges_per_s"] = round(2 * e / per_iter)
            except Exception as exc:  # noqa: BLE001
                log(f"[{mode}] FAILED: {exc}")
                res[mode] = None
        out[gname] = res
        out[gname + "_edges"] = e
        t_tiles = st.num_tiles
        dense_ms = 2 * 2 * t_tiles * block * block * d / 197e12 * 1e3
        hbm_ms = 2 * (t_tiles * block * block
                      + st.num_nodes * d * 2
                      + st.num_row_nodes * d * 4) / 819e9 * 1e3
        out[gname + "_floor_ms"] = {"mxu_dense": round(dense_ms, 3),
                                    "hbm": round(hbm_ms, 3)}
        log(f"{gname}: floors mxu={dense_ms:.3f} hbm={hbm_ms:.3f} ms/iter; "
            f"{res}")
    if out["powerlaw"].get("full"):
        out["value"] = out["powerlaw"]["full"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
