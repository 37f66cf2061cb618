"""Multi-host / multi-slice initialization.

The reference is single-process, single-GPU (``SURVEY.md`` §2.4).  At scale
this framework runs SPMD across hosts: call :func:`initialize` once per
process before any jax computation; the data-parallel mesh from
``parallel.mesh`` then spans every chip in the job, gradient ``psum`` rides
ICI within a slice and DCN across slices (XLA picks the transport from the
mesh's device order — keep the mesh axis ordered so slice-local devices are
contiguous, which :func:`make_global_mesh` does).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from dsrg_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-based defaults (no-op if single)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-axis mesh over all global devices, slice-contiguous device order.

    Devices are sorted by (slice_index, device id) so that data-parallel
    collectives reduce within a slice over ICI before crossing DCN.
    """
    devices = sorted(
        jax.devices(),
        key=lambda d: (getattr(d, "slice_index", 0), d.id),
    )
    return Mesh(np.asarray(devices), (axis,))


def local_batch_slice(global_batch: int) -> slice:
    """This process's shard of a globally-sharded batch (per-host loaders)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
