"""tpugraph — a TPU-native GNN message-passing + GNNExplainer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RexYing/gnn-model-explainer (NeurIPS 2019 GNNExplainer reference code):

* sparse edge-list message passing (``tpugraph.ops``) replacing the
  reference's dense-adjacency matmuls (reference ``models.py:58-80``),
  with Pallas block-sparse TPU kernels for the hot SpMM/SDDMM path;
* GCN/GAT node- and graph-classification encoders plus DiffPool
  (``tpugraph.nn``; reference ``models.py:83-617``);
* synthetic motif datasets syn1–syn5, TU-benchmark / BioSnap / Enron
  readers and a static-shape padded batching pipeline (``tpugraph.data``;
  reference ``gengraph.py``, ``utils/graph_utils.py``, ``utils/io_utils.py``);
* optax training loops with checkpoint + "computation graph" bundle
  handoff (``tpugraph.train``; reference ``train.py``);
* the GNNExplainer mask-optimization engine with edge/feature masks,
  the 5-term loss, gradient/attention baselines, alignment and
  representer experiments, and motif ground-truth AUC evaluation
  (``tpugraph.explain``; reference ``explainer/explain.py``);
* multi-chip scaling via ``jax.sharding`` meshes: data-parallel batches
  and edge-partitioned halo-exchange message passing (``tpugraph.parallel``);
* host-side visualization and ``.npy`` mask export compatible with the
  reference's notebooks (``tpugraph.viz``).
"""

__version__ = "0.1.0"

from tpugraph.core.graph import Graph, BatchedGraphs  # noqa: F401
