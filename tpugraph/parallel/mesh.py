"""Device-mesh setup.

The reference is strictly single-device (`CUDA_VISIBLE_DEVICES` +
``.cuda()``, reference ``train.py:1148-1150`` — SURVEY §2.2).  The TPU
framework scales through ``jax.sharding.Mesh``: a 1-D ``data`` axis for
batch/edge/query parallelism (ICI within a slice), extensible to a
``("dcn", "data")`` 2-D mesh for multi-host pods via
``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    num_devices: int = 0,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first ``num_devices`` visible devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    if len(axis_names) != 1:
        raise ValueError("only 1-D meshes supported for now")
    return Mesh(np.asarray(devs), axis_names=tuple(axis_names))


def init_distributed() -> None:
    """Multi-host init (no-op when single-process).  On a real pod slice
    call before any jax op; coordinator/process ids come from the TPU
    runtime environment."""
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass
