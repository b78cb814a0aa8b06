"""Transfer-tunnel + pack-cost diagnosis (VERDICT r3 item 7).

Questions this answers with measurements:
1. Raw host->device transfer bandwidth at 100 MB / 500 MB / 1.4 GB —
   is ~19 MB/s (implied by BENCH_r03's 72 s resident pack+upload) the
   tunnel's floor, or is the pack leaving bandwidth on the table?
2. Where the resident pack time goes: native int8 emit (host) vs
   stack layout (host) vs upload (tunnel).
3. Whether chunked uploads (8 slices + device-side concat) beat one
   monolithic device_put.

Prints ONE JSON line with the breakdown; results recorded in
BASELINE_MEASURED.md and used to set the format-rule pack constants
(train/loop.py).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import enable_compile_cache, make_powerlaw_graph

    enable_compile_cache()
    platform = jax.devices()[0].platform
    log(f"platform: {platform}, device: {jax.devices()[0]}")
    out = {"platform": platform}

    rng = np.random.default_rng(0)
    for mb in (100, 500, 1433):
        a = rng.integers(-100, 100, size=(mb * 2**20,), dtype=np.int8)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        out[f"device_put_{mb}mb_s"] = round(dt, 2)
        out[f"device_put_{mb}mb_mb_per_s"] = round(mb / dt, 1)
        log(f"device_put {mb} MB: {dt:.2f}s = {mb / dt:.1f} MB/s")
        del d, a

    # chunked upload of the same 1.4 GB: 8 slices + one device concat
    mb = 1433
    a = rng.integers(-100, 100, size=(mb * 2**20,), dtype=np.int8)
    t0 = time.perf_counter()
    parts = [jax.device_put(c) for c in np.array_split(a, 8)]
    d = jnp.concatenate(parts)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    out["device_put_1433mb_chunked8_s"] = round(dt, 2)
    log(f"device_put 1433 MB chunked x8 + concat: {dt:.2f}s "
        f"= {mb / dt:.1f} MB/s")
    del d, parts, a

    # resident pack breakdown at bench scale (65k / 2.1M powerlaw)
    from tpugraph.ops.bcsr import bcsr_from_coo
    from tpugraph.ops.pallas_resident import stack_bcsr

    n, deg, block = 65536, 32, 256
    s2, r2, w2 = make_powerlaw_graph(n, deg)
    t0 = time.perf_counter()
    m_host = bcsr_from_coo(s2, r2, w2, n, block=block,
                           tile_dtype=jnp.int8, device=False)
    t_emit = time.perf_counter() - t0
    tiles_mb = m_host.tiles.size / 2**20
    t0 = time.perf_counter()
    st = stack_bcsr(m_host, stack=1, k_pack=256)
    jax.block_until_ready(st.tiles)
    t_stack_upload = time.perf_counter() - t0
    out.update(
        resident_pack_emit_s=round(t_emit, 1),
        resident_pack_stack_upload_s=round(t_stack_upload, 1),
        resident_tiles_mb=round(tiles_mb, 1),
        resident_upload_mb_per_s=round(tiles_mb / max(t_stack_upload,
                                                      1e-9), 1),
    )
    log(f"resident pack: native int8 emit {t_emit:.1f}s, "
        f"stack+upload {t_stack_upload:.1f}s for {tiles_mb:.0f} MB "
        f"({tiles_mb / max(t_stack_upload, 1e-9):.0f} MB/s)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
