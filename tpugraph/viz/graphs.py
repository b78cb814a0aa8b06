"""Host-side visualization: mask thresholding and explanation-subgraph
rendering (reference ``utils/io_utils.py:168-398``).

Consumes the dense masked-adjacency ``.npy`` contract, so the reference's
notebooks interoperate.  Writes matplotlib PDFs/PNGs; TensorBoard image
logging is replaced by plain file export (tensorboardX is optional in
this environment).
"""

from __future__ import annotations

import os
from typing import Optional

import networkx as nx
import numpy as np


def denoise_graph(
    adj: np.ndarray,
    node_idx: int,
    feat: Optional[np.ndarray] = None,
    label: Optional[np.ndarray] = None,
    threshold: Optional[float] = None,
    threshold_num: Optional[int] = None,
    max_component: bool = True,
) -> nx.Graph:
    """Threshold a weighted mask into an explanation subgraph.

    Behavioral contract (reference ``denoise_graph``,
    ``io_utils.py:193-245``): given a dense symmetric mask, keep entries
    with weight ``>= threshold`` — or, with ``threshold_num``, the top-k
    *undirected* edges — as a weighted nx.Graph; the query node carries a
    ``self`` marker, nodes optionally carry ``feat``/``label``; finally
    restrict to the largest connected component (or drop isolates).
    """
    adj = np.asarray(adj)
    num_nodes = adj.shape[-1]

    if threshold_num is not None:
        # A symmetric mask stores every undirected edge in both triangles,
        # so the k-th largest undirected weight is the (2k)-th entry.
        positive = adj[adj > 0]
        keep = min(2 * threshold_num, positive.size)
        threshold = float(np.partition(positive, -keep)[-keep]) if keep else 1.0

    cutoff = 1e-6 if threshold is None else threshold
    rows, cols = np.nonzero(adj > cutoff if threshold is None else adj >= cutoff)

    G = nx.Graph()
    G.add_nodes_from(range(num_nodes))
    G.nodes[node_idx]["self"] = 1
    if feat is not None:
        nx.set_node_attributes(G, {u: feat[u] for u in range(num_nodes)}, "feat")
    if label is not None:
        nx.set_node_attributes(G, {u: label[u] for u in range(num_nodes)}, "label")
    G.add_weighted_edges_from(
        zip(rows.tolist(), cols.tolist(), adj[rows, cols].tolist())
    )

    if not max_component:
        G.remove_nodes_from(list(nx.isolates(G)))
    elif G.number_of_edges() > 0:
        G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    return G


def _node_palette(Gc: nx.Graph, nodecolor: str):
    """Pick a categorical colormap wide enough for the node classes drawn.

    In ``feat`` mode the class id is the hot index of a one-hot feature,
    so the palette must cover the feature dimension; otherwise the small
    qualitative palette suffices (contract of reference ``log_graph``).
    """
    if nodecolor == "feat":
        for _, data in Gc.nodes(data=True):
            if "feat" in data:
                dim = int(np.asarray(data["feat"]).size)
                if dim > 9:
                    return "tab20", 19
                if dim > 8:
                    return "tab10", 9
                break
    return "Set1", 8


def _node_color_class(data: dict, nodecolor: str, identify_self: bool):
    """Return (palette index, one-hot class or None) for one node."""
    if identify_self and "self" in data:
        return 0, None
    if nodecolor == "label" and "label" in data:
        return int(data["label"]) + 1, None
    if nodecolor == "feat" and "feat" in data:
        hot = np.flatnonzero(np.asarray(data["feat"]) == 1)
        cls = int(hot[0]) if hot.size else 0
        return cls, cls
    return 1, None


def log_graph(
    Gc: nx.Graph,
    name: str,
    outdir: str = "log",
    identify_self: bool = True,
    nodecolor: str = "label",
    epoch: int = 0,
    fig_size=(4, 3),
    dpi: int = 300,
    label_node_feat: bool = False,
    edge_vmax: Optional[float] = None,
) -> str:
    """Render an explanation subgraph to PDF.

    Behavioral contract (reference ``log_graph``, ``io_utils.py:248-360``):
    kamada-kawai layout; nodes colored by ``label``/``feat`` class with the
    query node (``self`` attribute) highlighted in a distinct color; edges
    drawn in grayscale by mask weight with the lightest edge anchored at
    mid-gray (never white) and the heaviest at black. Returns the written
    path, or "" for an empty graph.
    """
    if Gc.number_of_nodes() == 0 or Gc.number_of_edges() == 0:
        return ""

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    palette, vmax = _node_palette(Gc, nodecolor)
    node_colors = []
    feat_labels = {}
    for u, data in Gc.nodes(data=True):
        idx, cls = _node_color_class(data, nodecolor, identify_self)
        node_colors.append(idx)
        if cls is not None:
            feat_labels[u] = cls

    weights = np.asarray(
        [w for (_, _, w) in Gc.edges.data("weight", default=1.0)], dtype=float
    )
    hi = float(edge_vmax) if edge_vmax is not None else float(weights.max())
    lo = float(weights.min())
    # Anchor the grayscale window one weight-span below the lightest edge so
    # every edge lands in the upper (gray..black) half of the Greys cmap.
    gray_floor = lo - (hi - lo)

    fig = plt.figure(figsize=fig_size, dpi=dpi)
    ax = fig.add_subplot(111)
    pos = nx.kamada_kawai_layout(Gc, weight=None)
    nx.draw_networkx_nodes(
        Gc, pos, ax=ax, node_size=50, alpha=0.8, node_color=node_colors,
        cmap=plt.get_cmap(palette), vmin=0, vmax=vmax,
    )
    nx.draw_networkx_edges(
        Gc, pos, ax=ax, width=1.0, alpha=0.8, edge_color=weights,
        edge_cmap=plt.get_cmap("Greys"), edge_vmin=gray_floor, edge_vmax=hi,
    )
    if label_node_feat and feat_labels:
        nx.draw_networkx_labels(Gc, pos, labels=feat_labels, font_size=4, ax=ax)
    ax.set_axis_off()

    save_path = os.path.join(outdir, f"{name.replace('/', '_')}_{epoch}.pdf")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    fig.savefig(save_path, format="pdf")
    plt.close(fig)
    return save_path


def exp_moving_avg(values, decay: float = 0.85):
    """EMA smoothing for accuracy curves (reference
    ``utils/math_utils.py:8-16``)."""
    out = []
    last = None
    for v in values:
        last = v if last is None else decay * last + (1 - decay) * v
        out.append(last)
    return out


def plot_pr_curve(
    real,
    pred,
    name: str,
    outdir: str = "log",
    dpi: int = 200,
) -> str:
    """Precision-recall curve PNG for explanation masks vs motif ground
    truth (reference ``explain_nodes_gnn_stats``, ``explain.py:329-344``).
    ``real``: binary ground-truth edge labels; ``pred``: mask weights."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import average_precision_score, precision_recall_curve

    real = np.asarray(real)
    pred = np.asarray(pred)
    precision, recall, _ = precision_recall_curve(real, pred)
    ap = average_precision_score(real, pred)

    fig = plt.figure(dpi=dpi)
    plt.plot(recall, precision, lw=1.5)
    plt.xlabel("recall")
    plt.ylabel("precision")
    plt.title(f"AP = {ap:.3f}")
    plt.xlim(0, 1.02)
    plt.ylim(0, 1.02)
    save_path = os.path.join(outdir, f"{name.replace('/', '_')}.png")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def plot_accuracy_curve(
    train_accs,
    val_or_test_accs=None,
    name: str = "train_curve",
    outdir: str = "results",
    decay: float = 0.85,
    dpi: int = 300,
) -> str:
    """Training accuracy curve PNG with EMA smoothing (reference
    ``train.py:237-249`` + ``io_utils.gen_train_plt_name``)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    plt.switch_backend("agg")
    fig = plt.figure(dpi=dpi)
    epochs = list(range(len(train_accs)))
    plt.plot(epochs, exp_moving_avg(train_accs, decay), "-", lw=1,
             label="train")
    if val_or_test_accs is not None and len(val_or_test_accs) > 0:
        step = max(len(train_accs) // max(len(val_or_test_accs), 1), 1)
        xs = [i * step for i in range(len(val_or_test_accs))]
        plt.plot(xs, val_or_test_accs, "bo", markersize=3, label="eval")
    plt.xlabel("epoch")
    plt.ylabel("accuracy")
    plt.legend()
    save_path = os.path.join(outdir, f"{name}.png")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def log_assignment(
    assign_tensor: np.ndarray,
    G: "nx.Graph",
    name: str = "assignment",
    outdir: str = "log",
    epoch: int = 0,
    fig_size=(8, 4),
    dpi: int = 300,
) -> str:
    """DiffPool soft-assignment visualization (reference
    ``log_assignment``/``log_graph2``, ``io_utils.py:668-770``): heatmap of
    ``S`` next to the graph with nodes colored by their argmax cluster."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    assign = np.asarray(assign_tensor)
    if assign.ndim == 3:
        assign = assign[0]
    plt.switch_backend("agg")
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=fig_size, dpi=dpi)
    im = ax0.imshow(assign, cmap=plt.get_cmap("BuPu"), aspect="auto")
    fig.colorbar(im, ax=ax0)
    ax0.set_title("soft assignment S")

    clusters = np.argmax(assign, axis=-1)
    nodes = list(G.nodes())[: assign.shape[0]]
    sub = G.subgraph(nodes)
    pos = nx.spring_layout(sub, seed=0)
    nx.draw(
        sub, pos, ax=ax1, node_size=40,
        node_color=[clusters[i] for i in range(len(nodes))],
        cmap=plt.get_cmap("tab20"), width=0.5,
    )
    ax1.set_title("argmax cluster")
    save_path = os.path.join(outdir, f"{name.replace('/', '_')}_{epoch}.png")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def plot_cmap(cmap_name: str = "tab20", ncolor: int = 20,
              outdir: str = "log", name: str = "cmap") -> str:
    """Colormap legend export (reference ``plot_cmap_tb``,
    ``io_utils.py:363-398``)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    plt.switch_backend("agg")
    fig = plt.figure(figsize=(4, 1), dpi=200)
    gradient = np.linspace(0, 1, ncolor)[None, :]
    plt.imshow(gradient, aspect="auto", cmap=plt.get_cmap(cmap_name))
    plt.axis("off")
    save_path = os.path.join(outdir, f"{name}.png")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def save_matrix_image(
    mat: np.ndarray, name: str, outdir: str = "log", epoch: int = 0,
    fig_size=(8, 6), dpi: int = 200,
) -> str:
    """Heatmap image of a matrix (reference ``log_matrix``,
    ``io_utils.py:168-190``)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    plt.switch_backend("agg")
    fig = plt.figure(figsize=fig_size, dpi=dpi)
    mat = np.asarray(mat)
    if mat.ndim == 1:
        mat = mat[:, np.newaxis]
    plt.imshow(mat, cmap=plt.get_cmap("BuPu"))
    cbar = plt.colorbar()
    cbar.solids.set_edgecolor("face")
    plt.tight_layout()
    fig.canvas.draw()
    save_path = os.path.join(outdir, f"{name.replace('/', '_')}_{epoch}.png")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path
