"""API-compat shims for running the unmodified reference on modern
libs + CPU (same set as the r2 harness, BASELINE_MEASURED.md):
no algorithmic changes."""
import sys, types
import numpy as np

# ---- torch on CPU + deprecated APIs
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.Tensor.cuda = lambda self, *a, **k: self
nn.Module.cuda = lambda self, *a, **k: self
if not hasattr(nn.utils, "clip_grad_norm"):
    nn.utils.clip_grad_norm = nn.utils.clip_grad_norm_

_ce = F.cross_entropy
def cross_entropy(*args, size_average=None, **kw):
    if size_average is not None:
        kw.setdefault("reduction", "mean" if size_average else "sum")
    return _ce(*args, **kw)
F.cross_entropy = cross_entropy

_load = torch.load
def load(*args, **kw):
    kw.setdefault("weights_only", False)
    return _load(*args, **kw)
torch.load = load

# ---- networkx removed APIs
import networkx as nx
if not hasattr(nx, "to_numpy_matrix"):
    nx.to_numpy_matrix = lambda G, **kw: np.asmatrix(
        nx.to_numpy_array(G, **kw))
if not hasattr(nx, "from_numpy_matrix"):
    nx.from_numpy_matrix = lambda A, **kw: nx.from_numpy_array(
        np.asarray(A), **kw)
if not hasattr(nx, "connected_component_subgraphs"):
    nx.connected_component_subgraphs = lambda G: (
        G.subgraph(c).copy() for c in nx.connected_components(G))

# ---- tensorboardX stub (not installed)
class _W:
    def __init__(self, *a, **k): pass
    def add_scalar(self, *a, **k): pass
    def add_scalars(self, *a, **k): pass
    def add_image(self, *a, **k): pass
    def add_figure(self, *a, **k): pass
    def close(self): pass
    def flush(self): pass
tbx = types.ModuleType("tensorboardX")
tbx.SummaryWriter = _W
tbx.__path__ = []  # mark as package so 'import tensorboardX.utils' works
tbx_utils = types.ModuleType("tensorboardX.utils")
def figure_to_image(fig, close=True):
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    img = buf.reshape(h, w, 4)[:, :, :3].transpose(2, 0, 1)
    if close:
        import matplotlib.pyplot as plt
        plt.close(fig)
    return img
tbx_utils.figure_to_image = figure_to_image
tbx.utils = tbx_utils
sys.modules.setdefault("tensorboardX", tbx)
sys.modules.setdefault("tensorboardX.utils", tbx_utils)

# gen_syn4/gen_syn5 call io_utils.log_graph as a data-generation side
# effect with args=None (documented reference defect, SURVEY 2.3) —
# make the viz call non-fatal (no algorithmic change)
from utils import io_utils as _iou
_orig_log_graph = _iou.log_graph
def _safe_log_graph(*a, **kw):
    try:
        return _orig_log_graph(*a, **kw)
    except Exception:
        return None
_iou.log_graph = _safe_log_graph

# io_utils.read_graphfile does float(nx.__version__) — "3.6.1" doesn't
# parse; give it a float-parsable version string (same major.minor)
nx.__version__ = "3.6"
