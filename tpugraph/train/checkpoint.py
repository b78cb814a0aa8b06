"""Checkpoint I/O with the trained-model -> explainer handoff bundle.

The reference saves ``{epoch, model_type, optimizer, model_state,
optimizer_state, cg}`` to ``ckpt/<name>_<method>_h<H>_o<O>[suffix].pth.tar``
(reference ``utils/io_utils.py:37-103``); the ``cg`` "computation graph"
dict ``{adj, feat, label, pred, train_idx}`` is the contract the explainer
consumes (reference ``explainer_main.py:193-196``).

Here: a flax-msgpack params blob plus an ``.npz`` of the cg arrays in one
directory, same prefix naming scheme so experiment bookkeeping carries
over.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from flax import serialization


def gen_prefix(
    name: str,
    method: str = "base",
    hidden_dim: int = 20,
    output_dim: int = 20,
    bias: bool = True,
    suffix: str = "",
) -> str:
    """Reference ``io_utils.gen_prefix`` (``io_utils.py:37-51``)."""
    out = f"{name}_{method}_h{hidden_dim}_o{output_dim}"
    if not bias:
        out += "_nobias"
    if suffix:
        out += "_" + suffix
    return out


def gen_explainer_prefix(prefix: str, explainer_suffix: str = "") -> str:
    """Reference ``io_utils.gen_explainer_prefix`` (``io_utils.py:53-59``)."""
    out = prefix + "_explain"
    if explainer_suffix:
        out += "_" + explainer_suffix
    return out


def checkpoint_path(ckptdir: str, prefix: str, isbest: bool = False,
                    num_epochs: int = -1) -> str:
    """Directory path for a checkpoint (reference ``create_filename``,
    ``io_utils.py:63-78``, with a directory instead of ``.pth.tar``)."""
    path = os.path.join(ckptdir, prefix)
    if isbest:
        path = os.path.join(path, "best")
    elif num_epochs > 0:
        path = os.path.join(path, str(num_epochs))
    return path


def save_checkpoint(
    ckptdir: str,
    prefix: str,
    params: Any,
    cg_dict: Optional[Dict[str, Any]] = None,
    meta: Optional[Dict[str, Any]] = None,
    opt_state: Any = None,
    isbest: bool = False,
    num_epochs: int = -1,
) -> str:
    """Write params (msgpack), cg bundle (npz), and meta (json)."""
    path = checkpoint_path(ckptdir, prefix, isbest, num_epochs)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(opt_state))
    if cg_dict is not None:
        arrays = {
            k: np.asarray(v)
            for k, v in cg_dict.items()
            if v is not None and k != "train_idx"
        }
        np.savez_compressed(os.path.join(path, "cg.npz"), **arrays)
        if "train_idx" in cg_dict and cg_dict["train_idx"] is not None:
            np.save(
                os.path.join(path, "train_idx.npy"),
                np.asarray(cg_dict["train_idx"]),
            )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {"epoch": num_epochs, **(meta or {})},
            f,
            indent=2,
            default=lambda o: o.tolist() if hasattr(o, "tolist") else str(o),
        )
    return path


def load_checkpoint(ckptdir: str, prefix: str, params_template: Any = None,
                    isbest: bool = False) -> Dict[str, Any]:
    """Load checkpoint; returns ``{params, cg, meta, train_idx}``.

    ``params_template`` (a pytree of the right structure, e.g. from
    ``model.init``) restores typed arrays; without it the raw msgpack state
    dict is returned.  Raises a descriptive error if missing (reference
    ``load_ckpt``, ``io_utils.py:106-125``)."""
    path = checkpoint_path(ckptdir, prefix, isbest)
    pfile = os.path.join(path, "params.msgpack")
    if not os.path.isfile(pfile):
        raise FileNotFoundError(
            f"Checkpoint does not exist at {path!r}. You may have forgotten "
            f"to train a model for this dataset first: "
            f"python -m tpugraph.cli.train --dataset=<name>"
        )
    with open(pfile, "rb") as f:
        blob = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    out: Dict[str, Any] = {"params": params, "cg": None, "meta": None,
                           "train_idx": None}
    cg_file = os.path.join(path, "cg.npz")
    if os.path.isfile(cg_file):
        with np.load(cg_file, allow_pickle=False) as z:
            out["cg"] = {k: z[k] for k in z.files}
    ti = os.path.join(path, "train_idx.npy")
    if os.path.isfile(ti):
        out["train_idx"] = np.load(ti)
    mfile = os.path.join(path, "meta.json")
    if os.path.isfile(mfile):
        with open(mfile) as f:
            out["meta"] = json.load(f)
    return out
