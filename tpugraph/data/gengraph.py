"""Synthetic benchmark graphs syn1–syn5 (reference ``gengraph.py:32-295``).

Construction is host-side NetworkX/NumPy (cheap, one-time); the result is
converted to device-resident padded edge lists by
``tpugraph.data.pipeline``.  All generators accept an explicit seed and are
deterministic given it (the reference uses global numpy state and, as a
side effect of data generation, even creates TensorBoard writers —
``gengraph.py:253-255, 292-294`` — which we do not reproduce).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import networkx as nx
import numpy as np

from tpugraph.data import featgen
from tpugraph.data.shapes import build_graph


def perturb(
    graph_list: List[nx.Graph], p: float, rng: Optional[np.random.Generator] = None
) -> List[nx.Graph]:
    """Add ``p * |E|`` random new edges to each graph (reference
    ``gengraph.py:32-52``)."""
    rng = rng or np.random.default_rng()
    out = []
    for G_original in graph_list:
        G = G_original.copy()
        edge_count = int(G.number_of_edges() * p)
        for _ in range(edge_count):
            while True:
                u = int(rng.integers(0, G.number_of_nodes()))
                v = int(rng.integers(0, G.number_of_nodes()))
                if (not G.has_edge(u, v)) and (u != v):
                    break
            G.add_edge(u, v)
        out.append(G)
    return out


def join_graph(
    G1: nx.Graph,
    G2: nx.Graph,
    n_pert_edges: int,
    rng: Optional[np.random.Generator] = None,
) -> nx.Graph:
    """Union two graphs and add ``n_pert_edges`` random cross edges
    (reference ``gengraph.py:55-71``)."""
    rng = rng or np.random.default_rng()
    assert n_pert_edges > 0
    F = nx.compose(G1, G2)
    nodes1, nodes2 = list(G1.nodes()), list(G2.nodes())
    for _ in range(n_pert_edges):
        u = nodes1[int(rng.integers(0, len(nodes1)))]
        v = nodes2[int(rng.integers(0, len(nodes2)))]
        F.add_edge(u, v)
    return F


def preprocess_input_graph(G: nx.Graph, labels, normalize_adj: bool = False) -> dict:
    """Dense conversion with a leading batch dim of 1 — the reference's
    checkpoint ``cg`` contract (reference ``gengraph.py:74-98``)."""
    adj = np.asarray(nx.to_numpy_array(G))
    if normalize_adj:
        sqrt_deg = np.diag(1.0 / np.sqrt(np.sum(adj, axis=0) + 1e-12))
        adj = sqrt_deg @ adj @ sqrt_deg
    existing_node = list(G.nodes)[-1]
    feat_dim = G.nodes[existing_node]["feat"].shape[0]
    f = np.zeros((G.number_of_nodes(), feat_dim), dtype=np.float32)
    for i, u in enumerate(G.nodes()):
        f[i, :] = G.nodes[u]["feat"]
    return {
        "adj": adj[None].astype(np.float32),
        "feat": f[None],
        "labels": np.asarray(labels)[None],
    }


def gen_syn1(
    nb_shapes: int = 80,
    width_basis: int = 300,
    feature_generator: Optional[featgen.FeatureGen] = None,
    m: int = 5,
    seed: Optional[int] = None,
) -> Tuple[nx.Graph, List[int], str]:
    """BA basis + 80 house motifs, 1% edge perturbation (reference
    ``gengraph.py:106-138``).  Roles: 0 basis, 1/2/3 house positions."""
    rng = np.random.default_rng(seed)
    basis_type = "ba"
    list_shapes = [["house"]] * nb_shapes
    G, role_id, _ = build_graph(
        width_basis, basis_type, list_shapes, start=0, m=m, rng=rng
    )
    G = perturb([G], 0.01, rng=rng)[0]
    if feature_generator is None:
        feature_generator = featgen.ConstFeatureGen(np.ones(10, dtype=np.float32))
    feature_generator.gen_node_features(G)
    name = basis_type + "_" + str(width_basis) + "_" + str(nb_shapes)
    return G, role_id, name


def gen_syn2(
    nb_shapes: int = 100, width_basis: int = 350, seed: Optional[int] = None
) -> Tuple[nx.Graph, List[int], str]:
    """Two syn1 communities with Gaussian community features joined by
    ``width_basis`` random edges (reference ``gengraph.py:141-184``).
    8 classes (4 roles x 2 communities); 10-d features."""
    rng = np.random.default_rng(seed)
    random_mu = [0.0] * 8
    random_sigma = [1.0] * 8
    mu_1 = np.array([-1.0] * 2 + random_mu)
    sigma_1 = np.array([0.5] * 2 + random_sigma)
    mu_2 = np.array([1.0] * 2 + random_mu)
    sigma_2 = np.array([0.5] * 2 + random_sigma)
    feat_gen1 = featgen.GaussianFeatureGen(mu=mu_1, sigma=sigma_1, rng=rng)
    feat_gen2 = featgen.GaussianFeatureGen(mu=mu_2, sigma=sigma_2, rng=rng)
    G1, role_id1, _ = gen_syn1(
        feature_generator=feat_gen1, m=4, seed=int(rng.integers(2**31))
    )
    G2, role_id2, _ = gen_syn1(
        feature_generator=feat_gen2, m=4, seed=int(rng.integers(2**31))
    )
    G1_size = G1.number_of_nodes()
    num_roles = max(role_id1) + 1
    role_id2 = [r + num_roles for r in role_id2]
    label = role_id1 + role_id2

    g1_map = {n: i for i, n in enumerate(G1.nodes())}
    G1 = nx.relabel_nodes(G1, g1_map)
    g2_map = {n: i + G1_size for i, n in enumerate(G2.nodes())}
    G2 = nx.relabel_nodes(G2, g2_map)
    G = join_graph(G1, G2, width_basis, rng=rng)
    name = "ba_" + str(width_basis) + "_" + str(nb_shapes) + "_2comm"
    return G, label, name


def gen_syn3(
    nb_shapes: int = 80,
    width_basis: int = 300,
    feature_generator: Optional[featgen.FeatureGen] = None,
    m: int = 5,
    seed: Optional[int] = None,
) -> Tuple[nx.Graph, List[int], str]:
    """BA basis + 3x3 grid motifs, 1% perturbation (reference
    ``gengraph.py:187-218``)."""
    rng = np.random.default_rng(seed)
    list_shapes = [["grid", 3]] * nb_shapes
    G, role_id, _ = build_graph(width_basis, "ba", list_shapes, start=0, m=m, rng=rng)
    G = perturb([G], 0.01, rng=rng)[0]
    if feature_generator is None:
        feature_generator = featgen.ConstFeatureGen(np.ones(10, dtype=np.float32))
    feature_generator.gen_node_features(G)
    name = "ba_" + str(width_basis) + "_" + str(nb_shapes)
    return G, role_id, name


def gen_syn4(
    nb_shapes: int = 60,
    width_basis: int = 8,
    feature_generator: Optional[featgen.FeatureGen] = None,
    seed: Optional[int] = None,
) -> Tuple[nx.Graph, List[int], str]:
    """Balanced binary tree of height 8 + 6-cycles, 1% perturbation
    (reference ``gengraph.py:221-257``)."""
    rng = np.random.default_rng(seed)
    list_shapes = [["cycle", 6]] * nb_shapes
    G, role_id, _ = build_graph(width_basis, "tree", list_shapes, start=0, rng=rng)
    G = perturb([G], 0.01, rng=rng)[0]
    if feature_generator is None:
        feature_generator = featgen.ConstFeatureGen(np.ones(10, dtype=np.float32))
    feature_generator.gen_node_features(G)
    name = "tree_" + str(width_basis) + "_" + str(nb_shapes)
    return G, role_id, name


def gen_syn5(
    nb_shapes: int = 80,
    width_basis: int = 8,
    feature_generator: Optional[featgen.FeatureGen] = None,
    m: int = 3,
    seed: Optional[int] = None,
) -> Tuple[nx.Graph, List[int], str]:
    """Balanced binary tree of height 8 + 3x3 grids, 10% perturbation
    (reference ``gengraph.py:260-295``)."""
    rng = np.random.default_rng(seed)
    list_shapes = [["grid", m]] * nb_shapes
    G, role_id, _ = build_graph(width_basis, "tree", list_shapes, start=0, rng=rng)
    G = perturb([G], 0.1, rng=rng)[0]
    if feature_generator is None:
        feature_generator = featgen.ConstFeatureGen(np.ones(10, dtype=np.float32))
    feature_generator.gen_node_features(G)
    name = "tree_" + str(width_basis) + "_" + str(nb_shapes)
    return G, role_id, name


GENERATORS = {
    "syn1": gen_syn1,
    "syn2": gen_syn2,
    "syn3": gen_syn3,
    "syn4": gen_syn4,
    "syn5": gen_syn5,
}
