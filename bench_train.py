"""Secondary benchmark: end-to-end GCN training throughput at scale.

Full 3-layer GcnEncoderNode training epochs (fwd + bwd + Adam) on a
65k-node / 2.1M-edge graph with 128-d features — the production-scale
node-classification workload the reference cannot represent at all (its
dense [N, N] adjacency would need 17 GB and O(N^2 D) FLOPs per layer;
``preprocess_input_graph`` gengraph.py:83-98).

Compares the Pallas BCSR fast path (``TrainConfig(use_bcsr=True)``)
against the XLA gather/segment_sum COO path on the same chip.  Prints
one JSON line:
  {"metric": "train_epochs_per_s_65k_nodes", ...}
vs_baseline = bcsr_epochs_per_s / coo_epochs_per_s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from bench import (
    enable_compile_cache,
    log,
    make_banded_graph,
    make_powerlaw_graph,
)


def main() -> None:
    import jax

    enable_compile_cache()

    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.train.loop import TrainConfig, train_node_classifier

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    log(f"platform: {platform}, device: {jax.devices()[0]}")

    if on_tpu:
        n, deg, bw, d, hidden, epochs, chunk = 65536, 32, 192, 128, 128, 100, 50
        block = 256
    else:  # CPU smoke config (Pallas interpreter is slow)
        n, deg, bw, d, hidden, epochs, chunk = 512, 8, 64, 16, 16, 4, 2
        block = 128

    model = GcnEncoderNode(
        input_dim=d, hidden_dim=hidden, embedding_dim=hidden,
        label_dim=4, num_layers=3,
    )

    def measure(tag: str, g, feat, labels, use_bcsr: bool) -> float:
        cfg = TrainConfig(
            num_epochs=epochs, scan_chunk=chunk,
            use_bcsr=use_bcsr, bcsr_block=block,
        )
        # warm-up run compiles (and populates the persistent cache)
        t0 = time.perf_counter()
        out = train_node_classifier(model, g, feat, labels, cfg, seed=0)
        log(f"[{tag}] first run (incl. compile): {time.perf_counter()-t0:.1f}s; "
            f"loop {out['elapsed']:.2f}s; final train acc "
            f"{out['result_train']['acc']:.3f}")
        out2 = train_node_classifier(model, g, feat, labels, cfg, seed=0)
        eps = epochs / out2["elapsed"]
        log(f"[{tag}] steady: {out2['elapsed']:.2f}s for {epochs} epochs "
            f"= {eps:.2f} epochs/s")
        return eps

    s, r, w = make_banded_graph(n, deg, bw)
    g = graph_from_edges(s, r, n, edge_weight=w)
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((g.num_nodes_padded, d)).astype(np.float32)
    # band-position labels: learnable from neighborhood structure
    labels = (np.arange(n) * 4 // n).astype(np.int32)
    bcsr_eps = measure("bcsr-banded", g, feat, labels, True)
    coo_eps = measure("coo-banded", g, feat, labels, False)

    # Power-law (Chung-Lu) training: the low-locality topology class the
    # r3 resident kernel targets; bcsr_resident="auto" routes the TPU
    # aggregation through it (log-degree-bucket labels, learnable from
    # neighborhood structure).
    s2, r2, w2 = make_powerlaw_graph(n, deg)
    din = np.bincount(r2, minlength=n)
    perm = np.argsort(-din, kind="stable")
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    s2, r2 = inv[s2].astype(np.int32), inv[r2].astype(np.int32)
    g2 = graph_from_edges(s2, r2, n, edge_weight=w2)
    feat2 = rng.standard_normal((g2.num_nodes_padded, d)).astype(np.float32)
    deg2 = np.bincount(r2, minlength=n).astype(np.float64)
    labels2 = np.digitize(
        np.log1p(deg2), np.quantile(np.log1p(deg2), [0.25, 0.5, 0.75])
    ).astype(np.int32)
    pl_bcsr_eps = measure("bcsr-powerlaw", g2, feat2, labels2, True)
    pl_coo_eps = measure("coo-powerlaw", g2, feat2, labels2, False)

    print(
        json.dumps(
            {
                "metric": "train_epochs_per_s_65k_nodes",
                "value": bcsr_eps,
                "unit": "epochs/s",
                "vs_baseline": bcsr_eps / coo_eps,
                "powerlaw_epochs_per_s": pl_bcsr_eps,
                "powerlaw_vs_coo": pl_bcsr_eps / pl_coo_eps,
            }
        )
    )


if __name__ == "__main__":
    main()
