"""Secondary benchmark: GNNExplainer mask-optimization throughput.

Measures the vmapped batched mask optimization (60 syn1 query nodes x
100 Adam epochs — exactly the reference's default workload,
``explainer_main.py:311-313`` + ``explain.py:137-205``) on the current
device.  Prints one JSON line:
  {"metric": "explainer_mask_opt_steps_per_s", ...}

vs_baseline = measured steps/s over the reference implementation's
measured 10.9 steps/s (60*100 steps / 551.3 s on this machine's CPU —
BASELINE_MEASURED.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_STEPS_PER_S = 6000 / 551.3  # measured, BASELINE_MEASURED.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from bench import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tpugraph.cli.config import Config
    from tpugraph.cli.tasks import build_node_model, padded_features
    from tpugraph.core.graph import graph_from_networkx
    from tpugraph.data import featgen, gengraph
    from tpugraph.explain import ExplainConfig, Explainer
    from tpugraph.nn.layers import SparseAdj

    platform = jax.devices()[0].platform
    log(f"platform: {platform}, device: {jax.devices()[0]}")

    G, labels, _ = gengraph.gen_syn1(
        feature_generator=featgen.ConstFeatureGen(np.ones(10, np.float32)),
        seed=0,
    )
    g = graph_from_networkx(G)
    feat = padded_features(G, g)
    cfg = Config(dataset="syn1")
    model = build_node_model(cfg, feat.shape[1], int(max(labels)) + 1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feat),
        SparseAdj(g.senders, g.receivers, g.edge_weight),
    )

    import networkx as nx

    adj = np.asarray(nx.to_numpy_array(G), np.float32)[None]
    ex = Explainer(
        model, params, adj, feat[None, : adj.shape[1]],
        np.asarray(labels)[None],
        np.zeros((1, adj.shape[1], int(max(labels)) + 1), np.float32),
        n_hops=3, dataset="syn1", cfg=ExplainConfig(num_epochs=100),
    )
    nodes = list(range(400, 700, 5))
    total_steps = len(nodes) * 100

    # compile + first run
    t0 = time.perf_counter()
    ex.explain_nodes_batch(nodes)
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ex.explain_nodes_batch(nodes)
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps_per_s = total_steps / best
    log(f"{len(nodes)} queries x 100 epochs in {best:.2f}s "
        f"-> {steps_per_s:.1f} mask-opt steps/s")
    print(json.dumps({
        "metric": "explainer_mask_opt_steps_per_s",
        "value": steps_per_s,
        "unit": "steps/s",
        "vs_baseline": steps_per_s / REFERENCE_STEPS_PER_S,
    }))


if __name__ == "__main__":
    main()
