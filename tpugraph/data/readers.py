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


def read_graphfile(
    datadir: str, dataname: str, max_nodes: Optional[int] = None
) -> List[nx.Graph]:
    """Parse the TU graph-kernel format (reference ``read_graphfile``,
    ``io_utils.py:426-562``): ``_graph_indicator``, ``_A`` edge list,
    optional ``_node_labels`` (one-hot into node['label']),
    ``_node_attributes`` (node['feat']), ``_graph_labels`` remapped to
    0..C-1.  Graphs larger than ``max_nodes`` are dropped; node ids are
    relabeled from 0 per graph."""
    prefix = os.path.join(datadir, dataname, dataname)

    filename_graph_indic = prefix + "_graph_indicator.txt"
    graph_indic = {}
    with open(filename_graph_indic) as f:
        for i, line in enumerate(f, start=1):
            graph_indic[i] = int(line.strip())

    node_labels = []
    try:
        with open(prefix + "_node_labels.txt") as f:
            node_labels = [int(line.strip()) for line in f]
        num_unique = len(set(node_labels))
        label_vals = sorted(set(node_labels))
        label_map = {v: i for i, v in enumerate(label_vals)}
        node_labels = [label_map[l] for l in node_labels]
    except IOError:
        num_unique = 0

    node_attrs = []
    try:
        with open(prefix + "_node_attributes.txt") as f:
            for line in f:
                line = line.strip("\n")
                attrs = [
                    float(attr)
                    for attr in line.replace("\\s+", "").split(",")
                    if attr != ""
                ]
                node_attrs.append(np.array(attrs, dtype=np.float32))
    except IOError:
        pass

    graph_labels = []
    with open(prefix + "_graph_labels.txt") as f:
        for line in f:
            graph_labels.append(int(line.strip()))
    label_vals = sorted(set(graph_labels))
    label_map = {v: i for i, v in enumerate(label_vals)}
    graph_labels = np.array([label_map[l] for l in graph_labels])

    adj_list: dict = {i + 1: [] for i in range(max(graph_indic.values()))}
    index_graph: dict = {i + 1: [] for i in range(max(graph_indic.values()))}
    num_edges = 0
    with open(prefix + "_A.txt") as f:
        for line in f:
            line = line.strip("\n").split(",")
            e0, e1 = int(line[0].strip()), int(line[1].strip())
            adj_list[graph_indic[e0]].append((e0, e1))
            index_graph[graph_indic[e0]] += [e0, e1]
            num_edges += 1
    for k in index_graph.keys():
        index_graph[k] = [u - 1 for u in set(index_graph[k])]

    graphs = []
    for i in range(1, 1 + len(adj_list)):
        G = nx.from_edgelist(adj_list[i])
        if max_nodes is not None and max_nodes > 0 and G.number_of_nodes() > max_nodes:
            continue
        G.graph["label"] = int(graph_labels[i - 1])
        for u in G.nodes():
            if len(node_labels) > 0:
                node_label_one_hot = [0] * num_unique
                node_label = node_labels[u - 1]
                node_label_one_hot[node_label] = 1
                G.nodes[u]["label"] = node_label_one_hot
            if len(node_attrs) > 0:
                G.nodes[u]["feat"] = node_attrs[u - 1]
        if len(node_attrs) > 0:
            G.graph["feat_dim"] = node_attrs[0].shape[0]

        mapping = {n: it for it, n in enumerate(G.nodes())}
        graphs.append(nx.relabel_nodes(G, mapping))
    return graphs


def read_biosnap(
    datadir: str,
    edgelist_file: str,
    label_file: str,
    feat_file: Optional[str] = None,
) -> nx.Graph:
    """BioSnap PPI + essentiality labels (+ optional gene-motif features,
    log-transformed and concatenated with a degree one-hot).  Keeps the
    largest connected component and drops unlabeled / featureless nodes
    (reference ``read_biosnap``, ``io_utils.py:565-634``)."""
    import csv

    G = nx.Graph()
    delimiter = "\t" if edgelist_file.endswith(".tsv") else ","
    with open(os.path.join(datadir, edgelist_file)) as f:
        for row in csv.reader(f, delimiter=delimiter):
            if not row or row[0].startswith("#"):
                continue
            try:
                u, v = int(row[0]), int(row[1])
            except ValueError:
                continue
            G.add_edge(u, v)

    # essentiality labels: nodes listed in the label file are essential (1)
    essential = set()
    with open(os.path.join(datadir, label_file)) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            try:
                essential.add(int(line.split()[0]))
            except ValueError:
                continue
    missing = 0
    for u in G.nodes():
        G.nodes[u]["label"] = 1 if u in essential else 0
    if len(essential) == 0:
        missing += 1

    if feat_file is not None:
        feat_path = os.path.join(datadir, feat_file)
        feats = {}
        with open(feat_path) as f:
            reader = csv.reader(f)
            header = next(reader)
            for row in reader:
                try:
                    gene = int(row[0])
                except ValueError:
                    continue
                vec = np.array([float(x) if x else 0.0 for x in row[1:]],
                               dtype=np.float32)
                feats[gene] = np.log(vec + 0.1)
        deg_max = 10
        for u in list(G.nodes()):
            if u not in feats:
                G.remove_node(u)
                continue
        for u in G.nodes():
            onehot = np.zeros(deg_max + 1, dtype=np.float32)
            onehot[min(G.degree[u], deg_max)] = 1.0
            G.nodes[u]["feat"] = np.concatenate([feats[u], onehot])
    else:
        for u in G.nodes():
            G.nodes[u]["feat"] = np.ones(10, dtype=np.float32)

    # largest connected component
    largest = max(nx.connected_components(G), key=len)
    G = G.subgraph(largest).copy()
    G = nx.relabel_nodes(G, {n: i for i, n in enumerate(G.nodes())})
    return G


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
