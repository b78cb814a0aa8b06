"""Paired probe: fused single-stream pair kernel vs the 2-call resident
chain on the powerlaw bench graph.

MEASURED CONCLUSIONS (r5, TPU v5e):
* pair kp128 (single stream) = 4.30 ms/iter (9.76e8 edges/s) vs 2-call
  kp256 = 4.37 ms/iter (9.60e8) — the fusion saves ~1.5%: one grid
  setup (~104 us) minus the doubled step count at the VMEM-feasible
  k_pack and the phase-boundary downcast.  kp64 two-stream tied; kp16
  was 0.74 ms/iter SLOWER (per-step cost ~0.3 us binds below ~64
  tiles/step).
* PLATFORM QUIRK: interleaving variants in one process makes the FIRST
  variant's host-side timing report ~0 ms even though its checksum is
  correct and input-distinct — measure one variant per sequential loop
  (as bench.py does) or treat the slowest-variant window as authority.
  bench.py's in-situ numbers are the committed record.
"""
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import bench
bench.enable_compile_cache()
from bench import make_powerlaw_graph
from tpugraph.ops.bcsr import bcsr_from_coo
from tpugraph.ops.pallas_resident import (
    pack_pair, spmm_pair_resident, spmm_stacked_resident, stack_bcsr,
)
on_tpu = jax.devices()[0].platform == "tpu"
interp = not on_tpu
n, deg, d, block = 65536, 32, 128, 256
s, r, w = make_powerlaw_graph(n, deg)
m = bcsr_from_coo(s, r, w, n, block=block, tile_dtype=jnp.int8, device=False)
st = stack_bcsr(m, stack=1, k_pack=256)
pr = pack_pair(st, st)
jax.block_until_ready(pr.tiles)
rng = np.random.default_rng(0)
x0 = rng.standard_normal((st.num_nodes, d)).astype(np.float32)

@partial(jax.jit, static_argnames=("k","kp"))
def chain2(st, x, k, kp):
    def body(xc, _):
        y = spmm_stacked_resident(st, xc, k_pack=kp, interpret=interp, out_dtype=jnp.bfloat16)
        dx = spmm_stacked_resident(st, y, k_pack=kp, interpret=interp, out_dtype=jnp.bfloat16)
        dxf = dx.astype(jnp.float32)
        return (dxf * jax.lax.rsqrt(jnp.mean(dxf*dxf)+1e-9)).astype(jnp.bfloat16), ()
    xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
    return jnp.sum(xf.astype(jnp.float32))

@partial(jax.jit, static_argnames=("k","kp"))
def chainp(pr, x, k, kp):
    def body(xc, _):
        dx = spmm_pair_resident(pr, xc, k_pack=kp, interpret=interp)
        dxf = dx.astype(jnp.float32)
        return (dxf * jax.lax.rsqrt(jnp.mean(dxf*dxf)+1e-9)).astype(jnp.bfloat16), ()
    xf, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=k)
    return jnp.sum(xf.astype(jnp.float32))

K = 50
n_edges = int((w != 0).sum())
variants = {
    "2call-kp256": lambda xv: chain2(st, xv, k=K, kp=256),
    "pair-kp128": lambda xv: chainp(pr, xv, k=K, kp=128),
    "pair-kp64": lambda xv: chainp(pr, xv, k=K, kp=64),
}
for name, fn in variants.items():
    out = fn(jnp.asarray(x0)); out.block_until_ready()
best = {name: 1e9 for name in variants}
cks = {}
names = list(variants)
for i in range(1, 7):
    order = names if i % 2 else names[::-1]
    for j, name in enumerate(order):
        # DISTINCT input per (rep, variant): the plugin appears to serve
        # repeated (program-equivalent, same-value) executions from a
        # cache, which zeroes the measured time
        xv = jnp.asarray(x0 + 1e-3 * i + 1e-4 * j); xv.block_until_ready()
        t0 = time.perf_counter(); out = variants[name](xv); out.block_until_ready()
        best[name] = min(best[name], time.perf_counter()-t0)
        cks[name] = float(out)
for name in variants:
    print(f"[{name}] {best[name]/K*1e3:.3f} ms/iter = "
          f"{2*n_edges/(best[name]/K):.4e} edges/s (cks {cks[name]:.4e})",
          flush=True)
