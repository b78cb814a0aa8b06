"""kp sweep for the fused pair chains (probe).

MEASURED CONCLUSIONS (r5, TPU v5e):
* kp=128 is the shipped optimum for both topologies.
* At a raised 122 MB VMEM limit, kp192/kp256 COLLAPSE: banded 0.90 ms
  (vs 0.67 at kp128), powerlaw 8-9 ms (vs 4.34) — oversized streamed
  windows crowd the resident buffers and leave too few grid steps for
  the DMA pipeline (banded kp256 = 3 steps/phase).
* Below 128: banded kp64 0.71 / kp96 0.68 / kp128 0.67-0.72 ms — all
  within run noise; no win from more steps either.
* The first-timed variant in an interleaved loop reads ~0 ms
  (the plugin quirk documented in bench_pair_diag.py) — ignore it.
"""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import bench
bench.enable_compile_cache()
import tpugraph.ops.pallas_resident as res
# standard limit (the 122MB probe measured kp192/256 collapsing:
# banded 0.90 ms vs 0.67 at kp128, powerlaw 8-9 ms vs 4.34 — oversized
# windows crowd the resident buffers / starve the step pipeline)
from bench import make_banded_graph, make_powerlaw_graph
from tpugraph.ops.bcsr import bcsr_from_coo
from tpugraph.ops.pallas_resident import (
    pack_pair, spmm_pair_resident, stack_bcsr,
)
on_tpu = jax.devices()[0].platform == "tpu"
interp = not on_tpu
n, d, block = 65536, 128, 256
rng = np.random.default_rng(0)

@partial(jax.jit, static_argnames=("k","kp"))
def chainp(pr, x, k, kp):
    def body(xc, _):
        dx = spmm_pair_resident(pr, xc, k_pack=kp, interpret=interp)
        dxf = dx.astype(jnp.float32)
        return (dxf * jax.lax.rsqrt(jnp.mean(dxf*dxf)+1e-9)).astype(jnp.bfloat16), ()
    xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
    return jnp.sum(xf.astype(jnp.float32))

K = 50
for gname, mk in (("banded", lambda: make_banded_graph(n, 32, 256)),):
    s, r, w = mk()
    m = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=jnp.int8, device=False)
    st = stack_bcsr(m, stack=1, k_pack=768)  # divisible by 128/192/256
    pr = pack_pair(st, st)
    jax.block_until_ready(pr.tiles)
    x0 = rng.standard_normal((st.num_nodes, d)).astype(np.float32)
    n_edges = int((w != 0).sum())
    print(f"{gname}: {st.num_tiles} tiles, {n_edges} edges", flush=True)
    for kp in (32, 64, 96, 128):
        if st.num_tiles % kp:
            continue
        try:
            out = chainp(pr, jnp.asarray(x0), k=K, kp=kp); out.block_until_ready()
        except Exception as e:
            print(f"  kp{kp}: FAILED ({str(e)[:120]})", flush=True)
            continue
        best = 1e9
        for i in range(1, 4):
            xv = jnp.asarray(x0 + 1e-3*i); xv.block_until_ready()
            t0 = time.perf_counter(); out = chainp(pr, xv, k=K, kp=kp); out.block_until_ready()
            best = min(best, time.perf_counter()-t0)
        print(f"  kp{kp}: {best/K*1e3:.3f} ms/iter = {2*n_edges/(best/K):.4e} edges/s "
              f"(cks {float(out):.4e})", flush=True)
