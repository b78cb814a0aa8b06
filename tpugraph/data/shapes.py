"""Motif / shape library for synthetic graph construction.

Re-implements the generator vocabulary of the reference
(``utils/synthetic_structsim.py:13-343``): clique, cycle, diamond, tree,
fan, ba, house, grid, star, path, and the ``build_graph`` composer that
attaches shapes along a basis graph.  The reference dispatches shapes via
``eval(shape_type)`` (``synthetic_structsim.py:294, 315``); here a plain
registry dict is used instead.  Randomness flows through an explicit
``numpy.random.Generator`` for reproducible datasets.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import networkx as nx
import numpy as np

Shape = Tuple[nx.Graph, List[int]]


def clique(start, nb_nodes, nb_to_remove=0, role_start=0, rng=None) -> Shape:
    """Complete graph on ``nb_nodes`` nodes with optional random edge
    removals (removed-edge endpoints get role_start+1).  Reference
    ``synthetic_structsim.py:13-47``."""
    rng = rng or np.random.default_rng()
    G = nx.complete_graph(nb_nodes)
    roles = [role_start] * nb_nodes
    if nb_to_remove > 0:
        edges = list(G.edges())
        lst = rng.choice(len(edges), nb_to_remove, replace=False)
        for e in lst:
            u, v = edges[int(e)]
            G.remove_edge(u, v)
            roles[u] += 1
            roles[v] += 1
    G = nx.relabel_nodes(G, {k: k + start for k in range(nb_nodes)})
    return G, roles


def cycle(start, len_cycle, role_start=0, rng=None) -> Shape:
    """Cycle on ``len_cycle`` nodes (reference ``synthetic_structsim.py:50-69``)."""
    G = nx.Graph()
    G.add_nodes_from(range(start, start + len_cycle))
    for i in range(len_cycle - 1):
        G.add_edge(start + i, start + i + 1)
    G.add_edge(start + len_cycle - 1, start)
    return G, [role_start] * len_cycle


def diamond(start, role_start=0, rng=None) -> Shape:
    """6-node diamond (4-cycle + two apex nodes connected to all cycle
    nodes).  Reference ``synthetic_structsim.py:72-112``."""
    G = nx.Graph()
    G.add_nodes_from(range(start, start + 6))
    G.add_edges_from(
        [(start, start + 1), (start + 1, start + 2), (start + 2, start + 3),
         (start + 3, start)]
    )
    for apex in (start + 4, start + 5):
        G.add_edges_from([(apex, start + i) for i in range(4)])
    return G, [role_start] * 6


def tree(start, height, r=2, role_start=0, rng=None) -> Shape:
    """Balanced r-ary tree of given height, relabeled to start at ``start``
    (the reference forgets to relabel, ``synthetic_structsim.py:115-130``;
    it is only ever used with start=0 where relabeling is the identity)."""
    G = nx.balanced_tree(r, height)
    G = nx.relabel_nodes(G, {i: i + start for i in range(G.number_of_nodes())})
    return G, [0] * G.number_of_nodes()


def star(start, nb_branches, role_start=0, rng=None) -> Shape:
    """Star with ``nb_branches`` leaves; hub gets role_start, leaves
    role_start+1.  Reference ``synthetic_structsim.py:216-236``."""
    G = nx.Graph()
    G.add_nodes_from(range(start, start + nb_branches + 1))
    for k in range(1, nb_branches + 1):
        G.add_edge(start, start + k)
    roles = [role_start + 1] * (nb_branches + 1)
    roles[0] = role_start
    return G, roles


def fan(start, nb_branches, role_start=0, rng=None) -> Shape:
    """Star plus consecutive-leaf edges (reference
    ``synthetic_structsim.py:133-152``)."""
    G, roles = star(start, nb_branches, role_start=role_start)
    for k in range(1, nb_branches - 1):
        roles[k] += 1
        roles[k + 1] += 1
        G.add_edge(start + k, start + k + 1)
    return G, roles


def ba(start, width, role_start=0, m=5, rng=None) -> Shape:
    """Barabasi-Albert preferential-attachment basis (reference
    ``synthetic_structsim.py:155-175``)."""
    rng = rng or np.random.default_rng()
    seed = int(rng.integers(0, 2**31 - 1))
    G = nx.barabasi_albert_graph(width, m, seed=seed)
    G = nx.relabel_nodes(G, {nid: start + i for i, nid in enumerate(sorted(G))})
    return G, [role_start] * width


def house(start, role_start=0, rng=None) -> Shape:
    """5-node house: 4-cycle floor/walls + roof node joined to the two top
    nodes.  Roles: bottom pair role_start, middle pair role_start+1, roof
    role_start+2.  Reference ``synthetic_structsim.py:178-204``."""
    G = nx.Graph()
    G.add_nodes_from(range(start, start + 5))
    G.add_edges_from(
        [(start, start + 1), (start + 1, start + 2), (start + 2, start + 3),
         (start + 3, start)]
    )
    G.add_edges_from([(start + 4, start), (start + 4, start + 1)])
    roles = [role_start, role_start, role_start + 1, role_start + 1, role_start + 2]
    return G, roles


def grid(start, dim=2, role_start=0, rng=None) -> Shape:
    """dim x dim grid (reference ``synthetic_structsim.py:207-213``)."""
    G = nx.grid_graph([dim, dim])
    G = nx.convert_node_labels_to_integers(G, first_label=start)
    return G, [role_start] * G.number_of_nodes()


def path(start, width, role_start=0, rng=None) -> Shape:
    """Path graph; endpoints get role_start+1 (reference
    ``synthetic_structsim.py:239-260``)."""
    G = nx.Graph()
    G.add_nodes_from(range(start, start + width))
    for i in range(width - 1):
        G.add_edge(start + i, start + i + 1)
    roles = [role_start] * width
    roles[0] = roles[-1] = role_start + 1
    return G, roles


SHAPES = {
    "clique": clique,
    "cycle": cycle,
    "diamond": diamond,
    "tree": tree,
    "fan": fan,
    "ba": ba,
    "house": house,
    "grid": grid,
    "star": star,
    "path": path,
}


def build_graph(
    width_basis: int,
    basis_type: str,
    list_shapes: List[list],
    start: int = 0,
    rdm_basis_plugins: bool = False,
    add_random_edges: int = 0,
    m: int = 5,
    rng: Optional[np.random.Generator] = None,
):
    """Create a basis graph and attach shapes along it (reference
    ``synthetic_structsim.py:263-343``).

    Each shape is joined to the basis by one edge at regularly spaced (or
    random) plugin nodes; cycle shapes get an extra random edge with
    probability 0.5.  Role ids: basis nodes are 0; each shape *type* claims a
    contiguous role-id block starting after the basis.

    Returns ``(G, role_ids, plugins)``.
    """
    rng = rng or np.random.default_rng()
    if basis_type == "ba":
        basis, role_id = SHAPES[basis_type](start, width_basis, m=m, rng=rng)
    else:
        basis, role_id = SHAPES[basis_type](start, width_basis, rng=rng)

    n_basis, n_shapes = nx.number_of_nodes(basis), len(list_shapes)
    start += n_basis

    if rdm_basis_plugins:
        plugins = rng.choice(n_basis, n_shapes, replace=False)
    else:
        spacing = math.floor(n_basis / n_shapes)
        plugins = [int(k * spacing) for k in range(n_shapes)]
    seen_shapes = {"basis": [0, n_basis]}

    for shape_id, shape in enumerate(list_shapes):
        shape_type = shape[0]
        args = [start] + list(shape[1:]) + [0]
        graph_s, roles_graph_s = SHAPES[shape_type](*args, rng=rng)
        n_s = nx.number_of_nodes(graph_s)
        if shape_type in seen_shapes:
            col_start = seen_shapes[shape_type][0]
        else:
            col_start = int(np.max(role_id)) + 1
            seen_shapes[shape_type] = [col_start, n_s]
        basis.add_nodes_from(graph_s.nodes())
        basis.add_edges_from(graph_s.edges())
        basis.add_edge(start, plugins[shape_id])
        if shape_type == "cycle":
            # occasional second anchor edge (reference :326-330)
            if rng.random() > 0.5:
                a = int(rng.integers(1, 4))
                b = int(rng.integers(1, 4))
                basis.add_edge(a + start, b + plugins[shape_id])
        role_id += [r + col_start for r in roles_graph_s]
        start += n_s

    if add_random_edges > 0:
        for _ in range(add_random_edges):
            src, dest = rng.choice(nx.number_of_nodes(basis), 2, replace=False)
            basis.add_edge(int(src), int(dest))

    return basis, role_id, plugins
