"""Dataset readers: TU-Dortmund benchmark format, BioSnap PPI, Enron
(reference ``utils/io_utils.py:426-634``, ``train.py:770-866``).

All host-side; outputs are NetworkX graphs with ``feat``/``label`` node
attributes, consumed by the batching pipeline.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import networkx as nx
import numpy as np


def _read_int_column(path: str) -> Optional[List[int]]:
    """One integer per non-blank line, or None if the file is absent."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return [int(line) for line in f if line.strip()]


def _dense_remap(values: List[int]) -> List[int]:
    """Remap arbitrary integer categories onto 0..C-1 (sorted order)."""
    lut = {v: c for c, v in enumerate(sorted(set(values)))}
    return [lut[v] for v in values]


def read_graphfile(
    datadir: str,
    dataname: str,
    max_nodes: Optional[int] = None,
    edge_labels: bool = False,
) -> List[nx.Graph]:
    """Parse the TU graph-kernel format.

    Behavioral contract (reference ``read_graphfile``,
    ``io_utils.py:426-562``): ``<name>_graph_indicator.txt`` maps 1-based
    node ids to 1-based graph ids; ``<name>_A.txt`` is a comma-separated
    edge list over global node ids; optional ``_node_labels`` become
    one-hot ``node['label']`` lists, optional ``_node_attributes`` become
    float ``node['feat']`` vectors; ``_graph_labels`` are remapped to
    0..C-1 into ``G.graph['label']``.  With ``edge_labels=True``, the
    optional ``_edge_labels.txt`` is remapped to 0..C-1 and stored per
    edge as ``G.edges[u, v]['label']`` (the reference parses this file for
    Tox21_AHR, ``io_utils.py:490-504``).  Graphs larger than ``max_nodes``
    are dropped; each kept graph is relabeled with node ids from 0.
    """
    prefix = os.path.join(datadir, dataname, dataname)

    # graph_of_node[i] = 0-based graph id owning 1-based node id i+1
    graph_of_node = np.asarray(
        _read_int_column(prefix + "_graph_indicator.txt"), dtype=np.int64
    ) - 1
    num_graphs = int(graph_of_node.max()) + 1

    graph_labels = _dense_remap(_read_int_column(prefix + "_graph_labels.txt"))

    raw_node_labels = _read_int_column(prefix + "_node_labels.txt")
    node_onehots: Optional[np.ndarray] = None
    if raw_node_labels is not None:
        dense = _dense_remap(raw_node_labels)
        node_onehots = np.eye(max(dense) + 1, dtype=np.int64)[dense]

    node_feats: Optional[List[np.ndarray]] = None
    attr_path = prefix + "_node_attributes.txt"
    if os.path.exists(attr_path):
        node_feats = []
        with open(attr_path) as f:
            for line in f:
                vals = [float(tok) for tok in line.split(",") if tok.strip()]
                node_feats.append(np.asarray(vals, dtype=np.float32))

    per_graph_edges: List[list] = [[] for _ in range(num_graphs)]
    with open(prefix + "_A.txt") as f:
        raw_edges = [tuple(int(tok) for tok in line.split(",")[:2])
                     for line in f if line.strip()]
    edge_label_col = (
        _dense_remap(_read_int_column(prefix + "_edge_labels.txt") or [0])
        if edge_labels and os.path.exists(prefix + "_edge_labels.txt")
        else None
    )
    for k, (u, v) in enumerate(raw_edges):
        gid = graph_of_node[u - 1]
        if edge_label_col is not None:
            per_graph_edges[gid].append((u, v, {"label": edge_label_col[k]}))
        else:
            per_graph_edges[gid].append((u, v))

    graphs = []
    for gid in range(num_graphs):
        G = nx.Graph()
        G.add_edges_from(per_graph_edges[gid])
        if max_nodes is not None and 0 < max_nodes < G.number_of_nodes():
            continue
        G.graph["label"] = graph_labels[gid]
        for u in G.nodes():
            if node_onehots is not None:
                G.nodes[u]["label"] = node_onehots[u - 1].tolist()
            if node_feats is not None:
                G.nodes[u]["feat"] = node_feats[u - 1]
        if node_feats is not None:
            G.graph["feat_dim"] = int(node_feats[0].shape[0])
        graphs.append(nx.relabel_nodes(G, {n: i for i, n in enumerate(G.nodes())}))
    return graphs


def read_biosnap(
    datadir: str,
    edgelist_file: str,
    label_file: str,
    feat_file: Optional[str] = None,
    concat: bool = True,
) -> nx.Graph:
    """BioSnap PPI graph with gene-essentiality labels.

    Behavioral contract (reference ``read_biosnap``,
    ``io_utils.py:565-634``): build the graph from the edge list (TSV or
    CSV) and keep the largest connected component; the label file is a
    two-column TSV ``gene<TAB>Essential|Non-Essential`` and a node's label
    is ``1`` iff its second column equals ``"Essential"`` — nodes absent
    from the label file are dropped.  Without a feature file every node
    gets constant ``ones(10)``; with one, each row ``gene,v1..vD`` yields
    ``feat = [log(v + 0.1)..., 1.0, degree-onehot(10)]`` (``concat=True``)
    or just the log-features, and featureless nodes are dropped.
    """
    import csv

    G = nx.Graph()
    delimiter = "\t" if "tsv" in edgelist_file else ","
    with open(os.path.join(datadir, edgelist_file)) as f:
        for row in csv.reader(f, delimiter=delimiter):
            if not row or row[0].lstrip().startswith("#"):
                continue
            try:
                G.add_edge(int(row[0]), int(row[1]))
            except ValueError:
                continue

    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()

    # Two-column essentiality parse: label = (second column == "Essential").
    # Nodes never mentioned in the label file stay unlabeled and are dropped.
    with open(os.path.join(datadir, label_file)) as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) < 2 or row[0].lstrip().startswith("#"):
                continue
            try:
                gene = int(row[0])
            except ValueError:
                continue
            if gene in G:
                G.nodes[gene]["label"] = int(row[1].strip() == "Essential")
    G.remove_nodes_from([u for u in G.nodes() if "label" not in G.nodes[u]])

    if feat_file is None:
        for u in G.nodes():
            G.nodes[u]["feat"] = np.ones(10, dtype=np.float32)
    else:
        with open(os.path.join(datadir, feat_file)) as f:
            reader = csv.reader(f)
            next(reader)  # header row
            for row in reader:
                try:
                    gene = int(row[0])
                except ValueError:
                    continue
                if gene not in G:
                    continue
                logfeat = np.log(
                    np.array([float(x) if x else 0.0 for x in row[1:]],
                             dtype=np.float32) + 0.1
                )
                if concat:
                    onehot = np.zeros(10, dtype=np.float32)
                    # degree-1 in bucket 0, ..., degree >= 10 in bucket 9
                    onehot[max(min(G.degree[gene], 10) - 1, 0)] = 1.0
                    G.nodes[gene]["feat"] = np.concatenate(
                        [logfeat, [1.0], onehot]
                    ).astype(np.float32)
                else:
                    G.nodes[gene]["feat"] = logfeat
        G.remove_nodes_from([u for u in G.nodes() if "feat" not in G.nodes[u]])

    return nx.relabel_nodes(G, {n: i for i, n in enumerate(G.nodes())})


ENRON_LABELS = {
    "None": 5,
    "Employee": 0,
    "Vice President": 1,
    "Manager": 2,
    "Trader": 3,
    "CEO+Managing Director+Director+President": 4,
}


def load_enron_slices(
    datadir: str, num_slices: int = 10, input_dim: int = 10
) -> List[nx.Graph]:
    """Load the 10 pickled Enron time slices with constant features
    (reference ``enron_task``, ``train.py:816-840``)."""
    from tpugraph.data.featgen import ConstFeatureGen

    gen = ConstFeatureGen(np.ones(input_dim, dtype=np.float32))
    out = []
    for i in range(num_slices):
        path = os.path.join(datadir, "gnn-explainer-enron",
                            f"enron_slice_{i}.pkl")
        with open(path, "rb") as f:
            net = pickle.load(f)
        gen.gen_node_features(net)
        out.append(net)
    return out
