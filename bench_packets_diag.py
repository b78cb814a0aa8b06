"""Component isolation for the edge-packet kernel: where do the 17 ms/SpMM go?

Variants (all on the real powerlaw packets, 512x256 K=128 geometry):
  full      — the real kernel (DMA + one-hot builds + 2 matmuls)
  nodma     — x window replaced by a VMEM-resident dummy block (no DMA)
  noonehot  — DMA kept, one-hots replaced by constant bf16 matrices
  gatheronly— DMA + ohc build + gather matmul only (no ohr/scatter)
  f32build  — one-hots built in f32 then cast (layout-retile probe)
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

from bench import enable_compile_cache, log, make_powerlaw_graph


def main() -> None:
    import jax

    enable_compile_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpugraph.ops.packets import pack_edges

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        n, deg, d, K, reps = 65536, 32, 128, 20, 3
    else:
        n, deg, d, K, reps = 2048, 8, 128, 2, 1
    interp = not on_tpu
    br, bc, kk = 512, 256, 128
    PK = 8

    s, r, w = make_powerlaw_graph(n, deg)
    e = len(s)
    p = pack_edges(s, r, w, n, block_r=br, block_c=bc, k=kk)
    np_ = p.num_packets
    num_steps = np_ // PK
    log(f"{np_} packets, {num_steps} steps")

    def make_kernel(variant):
        cd = jnp.bfloat16

        def kernel(row_ref, col_ref, rows_ref, cols_ref, w_ref, x_ref,
                   out_ref, xbuf, sems):
            i = pl.program_id(0)
            base = i * PK
            row = row_ref[base]
            prev = row_ref[jnp.maximum(base - 1, 0)]

            @pl.when(jnp.logical_or(i == 0, row != prev))
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            lane_c = jax.lax.broadcasted_iota(jnp.int32, (kk, bc), 1)
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (br, kk), 0)

            use_dma = variant != "nodma"
            if use_dma:
                def dma(slot, j):
                    return pltpu.make_async_copy(
                        x_ref.at[pl.ds(col_ref[base + j] * bc, bc), :],
                        xbuf.at[slot], sems.at[slot],
                    )

                dma(0, 0).start()

            def body(j, _):
                if use_dma:
                    @pl.when(j + 1 < PK)
                    def _():
                        dma((j + 1) % 2, j + 1).start()

                    dma(j % 2, j).wait()
                    xb = xbuf[j % 2].astype(cd)
                else:
                    xb = xbuf[0].astype(cd)
                cl = cols_ref[j]
                rl = rows_ref[j]
                wv = w_ref[j]
                if variant == "noonehot":
                    ohc = jnp.full((kk, bc), 0.001, cd)
                    ohr = jnp.full((br, kk), 0.001, cd)
                elif variant == "f32build":
                    ohc = ((cl[:, None] == lane_c).astype(jnp.float32)
                           * wv[:, None]).astype(cd)
                    ohr = (sub_r == rl[None, :]).astype(jnp.float32).astype(cd)
                else:
                    ohc = (cl[:, None] == lane_c).astype(cd) \
                        * wv[:, None].astype(cd)
                    ohr = (sub_r == rl[None, :]).astype(cd)
                g = jnp.dot(ohc, xb, preferred_element_type=jnp.float32)
                if variant == "gatheronly":
                    out_ref[pl.ds(0, kk), :] += g
                else:
                    out_ref[:] += jnp.dot(
                        ohr, g.astype(cd), preferred_element_type=jnp.float32
                    )
                return ()

            jax.lax.fori_loop(0, PK, body, ())

        return kernel

    def run_variant(variant, x):
        kernel = make_kernel(variant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_steps,),
            in_specs=[
                pl.BlockSpec((PK, kk), lambda i, row, col: (i, 0)),
                pl.BlockSpec((PK, kk), lambda i, row, col: (i, 0)),
                pl.BlockSpec((PK, kk), lambda i, row, col: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((br, d),
                                   lambda i, row, col: (row[i * PK], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, bc, d), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def one(xx):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((p.num_nodes, d), jnp.float32),
                interpret=interp,
            )(p.row_of, p.col_blk, p.rows, p.cols, p.w, xx)

        @partial(jax.jit, static_argnames=("k",))
        def chained(x, k):
            def body(xc, _):
                y = one(xc)
                xc = (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-9))
                return xc.astype(x.dtype)[: x.shape[0]], ()

            xf, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(xf.astype(jnp.float32))

        t0 = time.perf_counter()
        out = chained(x, K)
        out.block_until_ready()
        first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = chained(x, K)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        per = min(times) / K
        log(f"[{variant}] compile {first:.1f}s; {per*1e3:.3f} ms/SpMM")
        return per

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (p.num_nodes, d)).astype(np.float32)
    ).astype(jnp.bfloat16)

    res = {}
    for v in ["full", "nodma", "noonehot", "gatheronly", "f32build"]:
        try:
            res[v] = run_variant(v, x) * 1e3
        except Exception as ex:
            log(f"{v} FAILED: {type(ex).__name__} {str(ex)[:200]}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
