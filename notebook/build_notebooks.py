"""Generate the two mask-visualization notebooks.

Reference parity (SURVEY §2 notebook row): the reference ships
``GNN-Explainer-Viz.ipynb`` (12 cells: load ``masked_adj_*.npy``, show the
full and threshold-filtered adjacency, extract + draw the explanation
subgraph) and ``GNN-Explainer-Viz-Interactive.ipynb`` (18 cells: ipywidgets
threshold slider, top-k weight threshold, JSON/PDF/npy export).  These
notebooks keep the same dense ``.npy`` contract, so masks produced by either
framework load interchangeably.  ``demo_masks/`` carries a small committed
mask set (syn1 nodes) so the notebooks execute out of the box:

    python notebook/build_notebooks.py          # regenerate .ipynb sources
    jupyter nbconvert --execute --to notebook --inplace notebook/*.ipynb
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src}


def code(src):
    return {
        "cell_type": "code", "metadata": {}, "execution_count": None,
        "outputs": [], "source": src,
    }


SETUP = """\
import glob, os
import numpy as np
import networkx as nx
import matplotlib.pyplot as plt

# expdir: wherever the explainer wrote masked_adj_*.npy.  The committed
# demo_masks/ set (syn1) makes this notebook runnable out of the box;
# point it at your own log/<prefix>_explain/ directory for real runs.
candidates = [
    "demo_masks",
    os.path.join("..", "log", "syn1_base_h20_o20_explain"),
]
expdir = next((d for d in candidates if glob.glob(os.path.join(d, "*.npy"))), candidates[0])
mask_files = sorted(glob.glob(os.path.join(expdir, "masked_adj_*.npy")))
print(f"{len(mask_files)} masks in {expdir}")
mask_files[:5]
"""

EXTRACT = """\
def extract_subgraph(adj, threshold=0.1, topk=0):
    \"\"\"Explanation subgraph from a dense mask: threshold by weight, or
    keep the top-k undirected edges; then keep the largest component.\"\"\"
    a = np.array(adj)
    if topk > 0:
        flat = np.sort(a[a > 0].ravel())
        if len(flat):
            threshold = flat[max(len(flat) - 2 * topk, 0)]
    a[a < threshold] = 0.0
    G = nx.from_numpy_array(a)
    G.remove_nodes_from(list(nx.isolates(G)))
    if G.number_of_edges() > 0:
        G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    return G
"""

DRAW = """\
def draw_subgraph(G, ax=None, title=None):
    \"\"\"Edge darkness = mask weight; kamada-kawai layout.\"\"\"
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 3), dpi=120)
    if G.number_of_nodes() == 0:
        ax.set_title("(empty)"); ax.axis("off"); return ax
    pos = nx.kamada_kawai_layout(G)
    ws = [d.get("weight", 1.0) for _, _, d in G.edges(data=True)]
    lo, hi = (min(ws), max(ws)) if ws else (0, 1)
    nx.draw_networkx_nodes(G, pos, ax=ax, node_size=40, node_color="#4C72B0", alpha=0.85)
    nx.draw_networkx_edges(G, pos, ax=ax, edge_color=ws, edge_cmap=plt.get_cmap("Greys"),
                           edge_vmin=lo - (hi - lo) - 1e-9, edge_vmax=hi, width=1.2)
    ax.set_title(title or "")
    ax.axis("off")
    return ax
"""


def build_static():
    cells = [
        md("# GNN-Explainer mask visualization\n\n"
           "Post-hoc inspection of explanation masks exported by the\n"
           "explainer (`masked_adj_*.npy`, the dense sub-adjacency\n"
           "contract shared with the reference implementation)."),
        code(SETUP),
        md("## Raw mask\n\nThe mask is a weighted sub-adjacency over the "
           "query's k-hop neighborhood; entry $(i, j)$ is the learned "
           "importance of edge $j \\to i$."),
        code("masked_adj = np.load(mask_files[0])\n"
             "print(masked_adj.shape, 'weights in',\n"
             "      (round(float(masked_adj.min()), 3), round(float(masked_adj.max()), 3)))\n"
             "plt.figure(figsize=(4, 3.2), dpi=120)\n"
             "plt.imshow(masked_adj, cmap='BuPu')\n"
             "plt.colorbar(); plt.title('masked adjacency')\n"
             "plt.show()"),
        md("## Threshold-filtered adjacency"),
        code("fig, axes = plt.subplots(1, 3, figsize=(10, 3), dpi=110)\n"
             "for ax, t in zip(axes, [0.05, 0.2, 0.5]):\n"
             "    a = np.where(masked_adj >= t, masked_adj, 0.0)\n"
             "    ax.imshow(a, cmap='BuPu'); ax.set_title(f'threshold {t}')\n"
             "plt.show()"),
        md("## Explanation subgraph\n\nThreshold (or top-k) the mask and "
           "keep the largest connected component — the explanation."),
        code(EXTRACT),
        code(DRAW),
        code("G = extract_subgraph(masked_adj, topk=12)\n"
             "print(G.number_of_nodes(), 'nodes,', G.number_of_edges(), 'edges')\n"
             "draw_subgraph(G, title='top-12 edges')\n"
             "plt.show()"),
        md("## Threshold sweep\n\nHow the explanation sparsifies as the "
           "threshold rises."),
        code("fig, axes = plt.subplots(1, 4, figsize=(13, 3), dpi=110)\n"
             "for ax, t in zip(axes, [0.02, 0.1, 0.3, 0.6]):\n"
             "    draw_subgraph(extract_subgraph(masked_adj, threshold=t), ax=ax,\n"
             "                  title=f'threshold {t}')\n"
             "plt.show()"),
        md("## Compare several query nodes"),
        code("fig, axes = plt.subplots(1, min(4, len(mask_files)), figsize=(13, 3), dpi=110)\n"
             "for ax, f in zip(np.atleast_1d(axes), mask_files[:4]):\n"
             "    draw_subgraph(extract_subgraph(np.load(f), topk=12), ax=ax,\n"
             "                  title=os.path.basename(f).split('node_idx_')[-1].split('graph')[0])\n"
             "plt.show()"),
        md("## Export\n\nNode-link JSON of the thresholded subgraph (same "
           "format the interactive notebook and external tools consume)."),
        code("from networkx.readwrite import json_graph\n"
             "import json\n"
             "G = extract_subgraph(masked_adj, topk=12)\n"
             "payload = json_graph.node_link_data(G, edges='links')\n"
             "out = os.path.join(expdir, 'subgraph_topk12.json')\n"
             "with open(out, 'w') as f:\n"
             "    json.dump(payload, f, default=float)\n"
             "print('wrote', out, '-', len(payload['nodes']), 'nodes')"),
    ]
    return cells


def build_interactive():
    cells = [
        md("# GNN-Explainer interactive mask explorer\n\n"
           "ipywidgets version: pick a mask file, slide the threshold or\n"
           "top-k, and export the selected explanation as npy / JSON / PDF.\n"
           "(Falls back to static rendering when ipywidgets is absent, so\n"
           "`nbconvert --execute` works headless.)"),
        code(SETUP),
        code(EXTRACT),
        code(DRAW),
        md("## Widgets"),
        code("try:\n"
             "    from ipywidgets import interact, FloatSlider, IntSlider, Dropdown\n"
             "    HAS_WIDGETS = True\n"
             "except ImportError:\n"
             "    HAS_WIDGETS = False\n"
             "print('ipywidgets available:', HAS_WIDGETS)"),
        code("def show(fname, threshold=0.1, topk=0):\n"
             "    adj = np.load(fname)\n"
             "    G = extract_subgraph(adj, threshold=threshold, topk=topk)\n"
             "    fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), dpi=110)\n"
             "    axes[0].imshow(np.where(adj >= threshold, adj, 0.0) if topk == 0 else adj,\n"
             "                   cmap='BuPu')\n"
             "    axes[0].set_title('mask')\n"
             "    draw_subgraph(G, ax=axes[1],\n"
             "                  title=f'{G.number_of_nodes()}n/{G.number_of_edges()}e')\n"
             "    plt.show()\n"
             "    return G"),
        md("### Threshold slider\n\nDrag to watch the explanation "
           "sparsify (static fallback renders three settings)."),
        code("if HAS_WIDGETS:\n"
             "    interact(show, fname=Dropdown(options=mask_files),\n"
             "             threshold=FloatSlider(min=0.0, max=1.0, step=0.02, value=0.1),\n"
             "             topk=IntSlider(min=0, max=40, value=0))\n"
             "else:\n"
             "    for t in [0.05, 0.2, 0.5]:\n"
             "        show(mask_files[0], threshold=t)"),
        md("### Top-k weight threshold\n\n`topk > 0` keeps the k heaviest "
           "undirected edges regardless of absolute scale."),
        code("G_sel = show(mask_files[0], topk=12)"),
        md("## Export the selected explanation"),
        code("# npy: thresholded dense mask (same contract as the input)\n"
             "adj_sel = np.load(mask_files[0])\n"
             "flat = np.sort(adj_sel[adj_sel > 0].ravel())\n"
             "thr = flat[max(len(flat) - 24, 0)] if len(flat) else 1.0\n"
             "np.save(os.path.join(expdir, 'mask_export.npy'),\n"
             "        np.where(adj_sel >= thr, adj_sel, 0.0))\n"
             "print('wrote mask_export.npy')"),
        code("# JSON: node-link data\n"
             "from networkx.readwrite import json_graph\n"
             "import json\n"
             "with open(os.path.join(expdir, 'mask_export.json'), 'w') as f:\n"
             "    json.dump(json_graph.node_link_data(G_sel, edges='links'), f, default=float)\n"
             "print('wrote mask_export.json')"),
        code("# PDF: rendered subgraph\n"
             "fig, ax = plt.subplots(figsize=(4, 3), dpi=150)\n"
             "draw_subgraph(G_sel, ax=ax, title='exported explanation')\n"
             "fig.savefig(os.path.join(expdir, 'mask_export.pdf'), format='pdf')\n"
             "plt.close(fig)\n"
             "print('wrote mask_export.pdf')"),
        md("## Batch contact sheet\n\nEvery mask in the directory at "
           "top-12 edges."),
        code("n = len(mask_files)\n"
             "cols = min(n, 4)\n"
             "rows = (n + cols - 1) // cols\n"
             "fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.6 * rows), dpi=100)\n"
             "for ax, f in zip(np.ravel(axes), mask_files):\n"
             "    draw_subgraph(extract_subgraph(np.load(f), topk=12), ax=ax,\n"
             "                  title=os.path.basename(f)[11:31])\n"
             "for ax in np.ravel(axes)[n:]:\n"
             "    ax.axis('off')\n"
             "plt.tight_layout(); plt.show()"),
    ]
    return cells


def write(path, cells):
    nb = {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    with open(path, "w") as f:
        json.dump(nb, f, indent=1)
    print(f"wrote {path} ({len(cells)} cells)")


if __name__ == "__main__":
    write(os.path.join(HERE, "GNN-Explainer-Viz.ipynb"), build_static())
    write(os.path.join(HERE, "GNN-Explainer-Viz-Interactive.ipynb"),
          build_interactive())
