"""Paired A/B: degree-snake vs label-prop partitioning for halo training
(8-device virtual mesh, power-law graph).

The full sweep in bench_scaling.py measures each partitioner in a
separate phase minutes apart; host-load drift on the time-shared virtual
mesh is several times the effect size (r4 lesson — separate-phase
overlap/plain ratios measured anywhere from 0.92x to 1.10x).  This bench
INTERLEAVES the two partitioners' steps rep-by-rep in one process, so
the comparison is fair, and reports the 8-dev step-time ratio plus the
plan-size facts (halo rows, edge balance) that drive it.

Prints ONE JSON line; artifact: results/halo_ab_r5.json.
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

    from bench import make_powerlaw_graph
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import SparseAdj
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.spmd import (
        balance_partition,
        build_halo_plan,
        locality_partition,
        make_halo_node_train_step,
    )

    n_dev, ns_per_dev, d_feat, n_cls, deg = 8, 2048, 64, 4, 8
    steps, reps = 8, 6
    n_nodes = ns_per_dev * n_dev
    mesh = make_mesh(n_dev)
    s, r, w = make_powerlaw_graph(n_nodes, deg, seed=7)

    def setup(partitioner):
        if partitioner == "snake":
            _, inv = balance_partition(r, n_nodes, n_dev)
            n_g = n_nodes
        else:
            perm, inv = locality_partition(s, r, n_nodes, n_dev, weights=w)
            n_g = len(perm)
        s2 = inv[s].astype(np.int32)
        r2 = inv[r].astype(np.int32)
        g = graph_from_edges(s2, r2, n_g,
                             num_edges_padded=((len(s2) + 7) // 8) * 8)
        plan = build_halo_plan(g, n_dev)
        n_total = plan.shard_size * n_dev
        live = np.asarray(plan.weights) != 0
        per_shard = live.sum(axis=1)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (n_total, d_feat)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, n_cls, n_total).astype(np.int32))
        mask = jnp.zeros((n_total,), jnp.float32).at[:n_nodes].set(1.0)
        model = GcnEncoderNode(input_dim=d_feat, hidden_dim=32,
                               embedding_dim=32, label_dim=n_cls,
                               num_layers=3)
        params = model.init(jax.random.PRNGKey(0), x,
                            SparseAdj(g.senders, g.receivers,
                                      g.edge_weight))
        tx = optax.adam(1e-3)
        step = make_halo_node_train_step(model, tx, mesh)
        state = [params, tx.init(params)]
        info = {
            "halo_rows_per_peer": int(plan.halo_size),
            "recv_rows_padded": int(plan.halo_size * (n_dev - 1)),
            "edge_balance": round(
                float(per_shard.max() / per_shard.mean()), 4),
            "e_max": int(plan.weights.shape[1]),
        }
        return step, state, plan, x, y, mask, info

    variants = {}
    for name in ("snake", "labelprop"):
        variants[name] = setup(name)
        # compile
        step, st, plan, x, y, m, _ = variants[name]
        p, o, loss = step(st[0], st[1], plan, x, y, m)
        st[0], st[1] = p, o
        jax.block_until_ready(loss)

    best = {name: float("inf") for name in variants}
    for rep in range(reps):
        for name in ("snake", "labelprop") if rep % 2 == 0 else (
                "labelprop", "snake"):
            step, st, plan, x, y, m, _ = variants[name]
            t0 = time.perf_counter()
            for _ in range(steps):
                st[0], st[1], loss = step(st[0], st[1], plan, x, y, m)
            jax.block_until_ready(loss)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / steps)
        log(f"rep {rep}: snake {best['snake'] * 1e3:.1f} ms, "
            f"labelprop {best['labelprop'] * 1e3:.1f} ms")

    ratio = best["labelprop"] / best["snake"]
    out = {
        "metric": "halo_labelprop_over_snake_steptime_8dev",
        "value": round(ratio, 4),
        "unit": "interleaved paired step-time ratio (powerlaw, <1 = "
                "labelprop faster)",
        "vs_baseline": round(1.0 / ratio, 4),
        "snake_ms_per_step": round(best["snake"] * 1e3, 2),
        "labelprop_ms_per_step": round(best["labelprop"] * 1e3, 2),
        "snake_plan": variants["snake"][6],
        "labelprop_plan": variants["labelprop"][6],
        "note": ("single-process interleaved reps (the only fair "
                 "comparison on the time-shared proxy — separate-phase "
                 "numbers drift more than the effect size, r4/r5); "
                 "fewer received halo rows trade against slightly "
                 "higher edge padding"),
    }
    os.makedirs("results", exist_ok=True)
    with open(os.path.join("results", "halo_ab_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
