"""Weak-scaling overhead of edge-partitioned training (virtual mesh).

BASELINE.json asks for ">=80% scaling 1 chip -> 1 host -> N hosts"; this
container exposes ONE physical chip, so the closest actionable proxy
(VERDICT r1 item 5) runs on the 8-device virtual CPU mesh: fixed
per-device edge count, 1 -> 2 -> 4 -> 8 devices, full node-classification
train step (edge-partitioned SpMM + psum + optimizer).

Virtual devices TIME-SHARE the host cores (they execute the N shards
sequentially), so wall-clock t(N) ~ N * t(1) even for a perfect program
— raw t1/tN would "measure" 1/N regardless of quality.  The meaningful
number is therefore the **program overhead efficiency**

    eff(N) = (N * t(1)) / t(N)

= 1.0 when partitioning + collectives add zero work beyond the N-fold
problem growth; < 0.8 would reveal superlinear communication or
partition imbalance that WOULD sink scaling on real hardware.

Prints ONE JSON line:
  {"metric": "weak_scaling_program_efficiency_8dev", "value": eff, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from bench import make_banded_graph, make_powerlaw_graph
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.spmd import (
        make_sharded_node_train_step,
        shard_graph_edges,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_nodes, d_feat, n_cls = 16384, 64, 4
    deg_per_dev = 8  # per-device edge budget = n_nodes * deg_per_dev
    steps, reps = 8, 3

    # Edge partitioning is TOPOLOGY-INSENSITIVE: the edge shards are
    # arbitrary slices and the per-layer psum of [N, D] partials does not
    # depend on where the edges point — so it is the prescribed strategy
    # for locality-free (power-law) graphs where node partitioning pays
    # a halo ~3.6x the shard (VERDICT r4 item 1a; the caveat is memory:
    # x is replicated, so it does NOT shrink per-device node state).
    mk_graphs = {
        "banded": lambda n_dev: make_banded_graph(
            n_nodes, deg_per_dev * n_dev, 256, seed=n_dev),
        "powerlaw": lambda n_dev: make_powerlaw_graph(
            n_nodes, deg_per_dev * n_dev, seed=n_dev),
    }
    all_out = {}
    for gname, mk in mk_graphs.items():
      times = {}
      for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        s, r, w = mk(n_dev)
        g = graph_from_edges(s, r, n_nodes,
                             num_edges_padded=((len(s) + 7) // 8) * 8)
        g = shard_graph_edges(g, mesh)
        repl = NamedSharding(mesh, P())
        x = jax.device_put(
            jnp.asarray(np.random.default_rng(0).standard_normal(
                (g.num_nodes_padded, d_feat)).astype(np.float32)), repl)
        y = jax.device_put(
            jnp.asarray(np.random.default_rng(1).integers(
                0, n_cls, g.num_nodes_padded).astype(np.int32)), repl)
        mask = jax.device_put(g.node_mask, repl)
        model = GcnEncoderNode(input_dim=d_feat, hidden_dim=32,
                               embedding_dim=32, label_dim=n_cls,
                               num_layers=3)
        params = jax.device_put(
            model.init(jax.random.PRNGKey(0), x,
                       SparseAdj(g.senders, g.receivers, g.edge_weight)),
            repl)
        tx = optax.adam(1e-3)
        opt = jax.device_put(tx.init(params), repl)
        step = make_sharded_node_train_step(model, tx, mesh)

        params, opt, loss = step(params, opt, g, x, y, mask)  # compile
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                params, opt, loss = step(params, opt, g, x, y, mask)
            jax.block_until_ready(loss)
            best = min(best, (time.perf_counter() - t0) / steps)
        times[n_dev] = best
        log(f"edge-part {gname} {n_dev} dev: {len(s)} edges total "
            f"({len(s) // n_dev}/dev), {best * 1e3:.1f} ms/step")

      effs = {n: n * times[1] / times[n] for n in times}
      log(f"edge-part {gname} weak-scaling program efficiency: "
          + ", ".join(f"{n}dev={effs[n]:.2f}" for n in sorted(effs)))
      all_out[gname] = {str(k): round(v, 3) for k, v in effs.items()}

    print(json.dumps({
        "metric": "weak_scaling_program_efficiency_8dev",
        "value": all_out["banded"]["8"],
        "unit": "N*t1/tN (fixed per-device edges)",
        "vs_baseline": all_out["banded"]["8"] / 0.8,  # target >= 80%
        "efficiency_by_devices": all_out["banded"],
        "powerlaw_efficiency_by_devices": all_out["powerlaw"],
        "note": ("virtual CPU devices time-share the host, so this "
                 "isolates partition+collective overhead, not ICI; "
                 "edge partitioning replicates x (no per-device memory "
                 "scaling) but its overhead is topology-independent — "
                 "the >=0.8 strategy for power-law graphs"),
    }))


def main_halo() -> None:
    """Weak-scaling of the node-partitioned HALO training path (VERDICT
    r2 item 8): fixed per-device nodes/edges on a power-law graph,
    1 -> 8 virtual devices, full 3-layer halo-exchange train step.
    Also reports the numbers the max-padded plan hides: shard edge
    balance (max/mean) and halo traffic per step."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from bench import make_powerlaw_graph
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.spmd import (
        build_halo_plan,
        make_halo_node_train_step,
        make_halo_overlap_train_step,
        split_halo_plan,
    )

    from bench import make_banded_graph
    from tpugraph.parallel.spmd import balance_partition, locality_partition

    ns_per_dev, d_feat, n_cls, deg = 2048, 64, 4, 8
    steps, reps = 8, 3
    num_layers = 3

    def powerlaw_balanced(n_nodes, n_dev):
        # degree-snake relabeling: fixes the 4.7x shard imbalance the
        # contiguous partition suffers on power-law graphs (r3)
        s, r, w = make_powerlaw_graph(n_nodes, deg, seed=7)
        _, inv = balance_partition(r, n_nodes, n_dev)
        return inv[s].astype(np.int32), inv[r].astype(np.int32), w, n_nodes

    def powerlaw_labelprop(n_nodes, n_dev):
        # locality-aware: balanced label propagation (native min-cut
        # refinement) — cuts the halo rows ~13% on Chung-Lu (r5); the
        # residual is topology (see bench_partition_ceiling.py)
        s, r, w = make_powerlaw_graph(n_nodes, deg, seed=7)
        perm, inv = locality_partition(s, r, n_nodes, n_dev, weights=w)
        return (inv[s].astype(np.int32), inv[r].astype(np.int32), w,
                len(perm))

    def banded(n_nodes, n_dev):
        s, r, w = make_banded_graph(n_nodes, deg, 192, seed=7)
        return s, r, w, n_nodes

    # ---- setup ALL configs first, then interleave every config's timing
    # reps round-robin: separate-phase measurement is worthless on the
    # time-shared proxy (r5: the same config measured 0.58-0.84 across
    # three sequential-phase runs), so each rep sweep times every config
    # under ~the same host conditions and min-over-reps samples the same
    # quiet windows for all of them.
    configs = []
    for gname, mk in (("banded", banded),
                      ("powerlaw_balanced", powerlaw_balanced),
                      ("powerlaw_labelprop", powerlaw_labelprop)):
      for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        n_nodes = ns_per_dev * n_dev
        s, r, w, n_graph = mk(n_nodes, n_dev)
        g = graph_from_edges(s, r, n_graph,
                             num_edges_padded=((len(s) + 7) // 8) * 8)
        plan = build_halo_plan(g, n_dev)
        n_total = plan.shard_size * n_dev
        # shard balance: live edges per device in the (max-padded) plan
        live = np.asarray(plan.weights) != 0
        per_shard = live.sum(axis=1)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (n_total, d_feat)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, n_cls, n_total).astype(np.int32))
        mask = jnp.zeros((n_total,), jnp.float32).at[:n_nodes].set(1.0)
        model = GcnEncoderNode(input_dim=d_feat, hidden_dim=32,
                               embedding_dim=32, label_dim=n_cls,
                               num_layers=num_layers)
        params = model.init(
            jax.random.PRNGKey(0), x,
            SparseAdj(g.senders, g.receivers, g.edge_weight))
        tx = optax.adam(1e-3)
        oplan = split_halo_plan(plan, n_dev)
        configs.append({
            "gname": gname, "n_dev": n_dev, "n_edges": len(s),
            "balance": float(per_shard.max() / max(per_shard.mean(), 1)),
            "halo_bytes": int(n_dev * n_dev * plan.halo_size * d_feat
                              * 4 * num_layers * 2),
            "halo_size": int(plan.halo_size),
            "plain": [make_halo_node_train_step(model, tx, mesh),
                      [params, tx.init(params)], plan],
            "overlap": [make_halo_overlap_train_step(model, tx, mesh),
                        [params, tx.init(params)], oplan],
            "data": (x, y, mask),
            "best": {"plain": float("inf"), "overlap": float("inf")},
        })

    for c in configs:  # compile everything before any timing
        for path in ("plain", "overlap"):
            step, st, pl_ = c[path]
            x, y, mask = c["data"]
            st[0], st[1], loss = step(st[0], st[1], pl_, x, y, mask)
            jax.block_until_ready(loss)
    log(f"{len(configs)} configs compiled; interleaving {2 * reps} rep "
        f"sweeps x {steps} steps")

    for rep in range(2 * reps):
        order = configs if rep % 2 == 0 else configs[::-1]
        for c in order:
            x, y, mask = c["data"]
            for path in ("plain", "overlap") if rep % 2 == 0 else (
                    "overlap", "plain"):
                step, st, pl_ = c[path]
                t0 = time.perf_counter()
                for _ in range(steps):
                    st[0], st[1], loss = step(st[0], st[1], pl_, x, y,
                                              mask)
                jax.block_until_ready(loss)
                c["best"][path] = min(
                    c["best"][path], (time.perf_counter() - t0) / steps)
        log(f"rep sweep {rep} done")

    all_out = {}
    for gname in ("banded", "powerlaw_balanced", "powerlaw_labelprop"):
      cs = {c["n_dev"]: c for c in configs if c["gname"] == gname}
      times = {n: cs[n]["best"]["plain"] for n in cs}
      times_ov = {n: cs[n]["best"]["overlap"] for n in cs}
      balance = {n: cs[n]["balance"] for n in cs}
      halo_bytes = {n: cs[n]["halo_bytes"] for n in cs}
      for n in sorted(cs):
          log(f"halo {gname} {n} dev: {cs[n]['n_edges']} edges "
              f"(balance {balance[n]:.2f}, halo {cs[n]['halo_size']}"
              f"/peer), {times[n] * 1e3:.1f} ms/step; overlap "
              f"{times_ov[n] * 1e3:.1f} ms/step")
      effs = {n: n * times[1] / times[n] for n in times}
      effs_ov = {n: n * times_ov[1] / times_ov[n] for n in times_ov}
      log(f"halo {gname} weak-scaling program efficiency: "
          + ", ".join(f"{n}dev={effs[n]:.2f}" for n in sorted(effs)))
      log(f"halo {gname} OVERLAP efficiency: "
          + ", ".join(f"{n}dev={effs_ov[n]:.2f}" for n in sorted(effs_ov)))
      all_out[gname] = {
          "efficiency_by_devices": {str(k): round(v, 3)
                                    for k, v in effs.items()},
          "overlap_efficiency_by_devices": {str(k): round(v, 3)
                                            for k, v in effs_ov.items()},
          "overlap_ms_per_step_8dev": round(times_ov[8] * 1e3, 2),
          "overlap_over_plain_ms_ratio_8dev": round(
              times_ov[8] / times[8], 3),
          "shard_edge_balance_max_over_mean": {
              str(k): round(v, 3) for k, v in balance.items()},
          "halo_bytes_per_step": halo_bytes,
      }

    print(json.dumps({
        "metric": "halo_weak_scaling_program_efficiency_8dev",
        "value": all_out["banded"]["efficiency_by_devices"]["8"],
        "unit": "N*t1/tN (fixed per-device nodes+edges)",
        "vs_baseline":
            all_out["banded"]["efficiency_by_devices"]["8"] / 0.9,
        "banded": all_out["banded"],
        "powerlaw_balanced": all_out["powerlaw_balanced"],
        "powerlaw_labelprop": all_out["powerlaw_labelprop"],
        "note": ("banded = the locality regime halo exchange targets; "
                 "power-law keeps balance ~1.0 after the degree-snake "
                 "relabeling but its boundary IS the whole shard "
                 "(bench_partition_ceiling.py quantifies the floor); "
                 "powerlaw_labelprop = balanced label-propagation "
                 "min-cut partitioning (native), the best-known halo "
                 "reduction on this topology; for a guaranteed >=0.8 "
                 "answer on power-law use edge partitioning (main(), "
                 "powerlaw case — topology-independent overhead, at the "
                 "cost of replicated x). Virtual CPU devices time-share "
                 "the host: this isolates partition + collective "
                 "overhead, not ICI. All configs' timing reps are "
                 "interleaved round-robin in one process (sequential-"
                 "phase runs measured the same config anywhere in "
                 "0.58-0.84 — drift exceeds the effects); "
                 "bench_halo_ab.py additionally pairs snake-vs-"
                 "labelprop back-to-back at 8 devices"),
    }))


if __name__ == "__main__":
    main()
    main_halo()
