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
    """Threshold a weighted mask into an explanation subgraph (reference
    ``denoise_graph``, ``io_utils.py:193-245``): keep edges above a weight
    threshold or the top-k edges, then keep the largest connected
    component (or drop isolated nodes)."""
    num_nodes = adj.shape[-1]
    G = nx.Graph()
    G.add_nodes_from(range(num_nodes))
    G.nodes[node_idx]["self"] = 1
    if feat is not None:
        for node in G.nodes():
            G.nodes[node]["feat"] = feat[node]
    if label is not None:
        for node in G.nodes():
            G.nodes[node]["label"] = label[node]

    if threshold_num is not None:
        # symmetric adj stores each edge twice
        adj_threshold_num = threshold_num * 2
        neigh_size = len(adj[adj > 0])
        threshold_num = min(neigh_size, adj_threshold_num)
        if threshold_num > 0:
            threshold = np.sort(adj[adj > 0])[-threshold_num]
        else:
            threshold = 1.0

    if threshold is not None:
        weighted_edge_list = [
            (i, j, adj[i, j])
            for i in range(num_nodes)
            for j in range(num_nodes)
            if adj[i, j] >= threshold
        ]
    else:
        weighted_edge_list = [
            (i, j, adj[i, j])
            for i in range(num_nodes)
            for j in range(num_nodes)
            if adj[i, j] > 1e-6
        ]
    G.add_weighted_edges_from(weighted_edge_list)
    if max_component:
        if G.number_of_edges() > 0:
            largest_cc = max(nx.connected_components(G), key=len)
            G = G.subgraph(largest_cc).copy()
    else:
        G.remove_nodes_from(list(nx.isolates(G)))
    return G


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
    """Render an explanation subgraph to PDF (reference ``log_graph``,
    ``io_utils.py:248-360``): kamada-kawai layout, node color by
    label/feat, edge grayscale by mask weight, query node highlighted.
    Returns the written path."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("Set1")
    plt.switch_backend("agg")
    fig = plt.figure(figsize=fig_size, dpi=dpi)

    node_colors = []
    edge_colors = [w for (u, v, w) in Gc.edges.data("weight", default=1)]

    # maximum value for node color
    vmax = 8
    for i in Gc.nodes():
        if nodecolor == "feat" and "feat" in Gc.nodes[i]:
            num_classes = Gc.nodes[i]["feat"].size
            if num_classes > 9:
                cmap = plt.get_cmap("tab20")
                vmax = 19
            elif num_classes > 8:
                cmap = plt.get_cmap("tab10")
                vmax = 9
            break

    feat_labels = {}
    for i in Gc.nodes():
        if identify_self and "self" in Gc.nodes[i]:
            node_colors.append(0)
        elif nodecolor == "label" and "label" in Gc.nodes[i]:
            node_colors.append(Gc.nodes[i]["label"] + 1)
        elif nodecolor == "feat" and "feat" in Gc.nodes[i]:
            feat = Gc.nodes[i]["feat"]
            feat_class = 0
            for j in range(len(feat)):
                if feat[j] == 1:
                    feat_class = j
                    break
            node_colors.append(feat_class)
            feat_labels[i] = feat_class
        else:
            node_colors.append(1)
    if not label_node_feat:
        feat_labels = None

    plt.switch_backend("agg")
    if Gc.number_of_nodes() == 0 or Gc.number_of_edges() == 0:
        plt.close(fig)
        return ""

    pos_layout = nx.kamada_kawai_layout(Gc, weight=None)
    weights = [d for (u, v, d) in Gc.edges(data="weight", default=1)]
    if edge_vmax is None:
        edge_vmax = statistics_max(weights)
    min_color = min(weights)
    edge_vmin = 2 * min_color - edge_vmax  # color range: gray to black
    nx.draw(
        Gc,
        pos=pos_layout,
        with_labels=False,
        font_size=4,
        labels=feat_labels,
        node_color=node_colors,
        vmin=0,
        vmax=vmax,
        cmap=cmap,
        edge_color=edge_colors,
        edge_cmap=plt.get_cmap("Greys"),
        edge_vmin=edge_vmin,
        edge_vmax=edge_vmax,
        width=1.0,
        node_size=50,
        alpha=0.8,
    )
    fig.axes[0].xaxis.set_visible(False)
    fig.canvas.draw()

    save_path = os.path.join(outdir, f"{name.replace('/', '_')}_{epoch}.pdf")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path, format="pdf")
    plt.close(fig)
    return save_path


def statistics_max(values):
    return max(values) if len(values) > 0 else 1.0


def exp_moving_avg(values, decay: float = 0.85):
    """EMA smoothing for accuracy curves (reference
    ``utils/math_utils.py:8-16``)."""
    out = []
    last = None
    for v in values:
        last = v if last is None else decay * last + (1 - decay) * v
        out.append(last)
    return out


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
