"""Device-mesh setup.

The reference is strictly single-device (`CUDA_VISIBLE_DEVICES` +
``.cuda()``, reference ``train.py:1148-1150`` — SURVEY §2.2).  The TPU
framework scales through ``jax.sharding.Mesh``:

* a 1-D ``("data",)`` mesh for batch/edge/query parallelism over ICI
  within a slice, and
* a 2-D ``("dcn", "data")`` mesh for multi-host pods: the slow outer
  axis (data-center network) carries only batch/gradient traffic, the
  fast inner axis (ICI) carries halo/edge collectives.  Shard batch axes
  with ``P(("dcn", "data"))`` so XLA keeps per-hop collectives on ICI.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def make_mesh(
    num_devices: int = 0,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a device mesh.

    1-D (default): the first ``num_devices`` visible devices on one
    ``data`` axis.  N-D: pass ``shape`` with one entry per axis name,
    e.g. ``make_mesh(axis_names=("dcn", "data"), shape=(2, 4))`` — the
    FIRST axis should be the slow (DCN) dimension; JAX device order
    places ICI neighbors adjacent, so the fastest-varying (last) mesh
    axis rides ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError(
                "multi-axis meshes need an explicit shape, e.g. "
                "make_mesh(axis_names=('dcn', 'data'), shape=(2, 4))"
            )
        return Mesh(np.asarray(devs), axis_names=tuple(axis_names))
    if len(shape) != len(axis_names):
        raise ValueError(f"shape {shape} vs axis_names {axis_names}")
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devs)}")
    return Mesh(
        np.asarray(devs[:n]).reshape(shape), axis_names=tuple(axis_names)
    )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host runtime init (call before any jax op on a pod slice).

    On TPU pods the coordinator/process ids come from the runtime
    environment and all arguments may be None.  Returns True when the
    distributed runtime is active after the call; single-process runs
    (no peers configured) return False instead of raising so local code
    paths keep working unchanged.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        log.info("jax.distributed not initialized (%s); single-process", e)
        return False
    except ValueError as e:
        # no coordinator configuration available -> single process
        log.info("jax.distributed not configured (%s); single-process", e)
        return False
