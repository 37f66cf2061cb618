"""Device-mesh construction and data-parallel step wrapping.

The reference is strictly single-GPU (``SURVEY.md`` §2.4: no collectives, no
multi-device support anywhere; host multiprocessing is its only parallelism).
Here data parallelism is first-class: a 1-axis ``Mesh`` over all local (or a
multi-slice set of) devices, batch sharded over the ``data`` axis, parameters
replicated, and gradients reduced with ``psum`` over ICI inside a
``shard_map``-wrapped train step.  The per-device flood-fill/CRF work stays
local — no per-iteration cross-device synchronization (which a naive
``jit``-sharded ``while_loop`` would introduce for the convergence check).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v), axis))
        for k, v in batch.items()
    }


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the leading (batch) dim to a multiple; append a {1,0} ``pad_mask``.

    Makes uneven global batches — the reference's stage-1 batch 20 and
    stage-2 batch 10 (train-s.prototxt:17-19, train-f.prototxt:11) — shard
    over any mesh (e.g. a v5p-8's 8 chips).  Pad rows replicate the last
    real sample (realistic values keep the CRF/grow numerics healthy); the
    mask removes their contribution from losses, gradients, and metrics
    exactly (the train steps reduce with weighted sums / psum'd valid
    counts), so the padded step reproduces the unpadded numbers.
    """
    b = int(np.shape(next(iter(batch.values())))[0])
    pad = (-b) % multiple
    out = dict(batch)
    if "pad_mask" not in out:
        out["pad_mask"] = np.ones((b,), np.float32)
    if pad == 0:
        return out
    padded = {}
    for k, v in out.items():
        v = np.asarray(v)
        tail = (
            np.zeros((pad,), v.dtype)
            if k == "pad_mask"
            else np.repeat(v[-1:], pad, axis=0)
        )
        padded[k] = np.concatenate([v, tail], axis=0)
    return padded


def pad_batch_to_rows(batch: dict, rows: int, n_valid: Optional[int] = None) -> dict:
    """Pad the leading dim to EXACTLY ``rows``; mark the first ``n_valid``
    rows valid in ``pad_mask`` and everything after them padding.

    The process-level analogue of :func:`pad_batch_to_multiple`: in a
    multi-host job each process must contribute exactly
    ``global_padded_batch / num_processes`` rows to the global array
    (``shard_global_batch``), and with an uneven global batch (the
    reference's batch 20 over e.g. 8 pod hosts) later processes carry
    fewer real samples — possibly zero, in which case every row is a
    masked replica of the one realistic sample the loader drew (realistic
    values keep CRF/grow numerics healthy; the mask removes any
    contribution exactly).
    """
    b = int(np.shape(next(iter(batch.values())))[0])
    assert 0 < b <= rows, (b, rows)
    n_valid = b if n_valid is None else min(n_valid, b)
    mask = np.zeros((rows,), np.float32)
    mask[:n_valid] = 1.0
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if rows > b:
            v = np.concatenate([v, np.repeat(v[-1:], rows - b, axis=0)], axis=0)
        out[k] = v
    out["pad_mask"] = mask
    return out


def shard_global_batch(local_batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Assemble a globally-sharded batch from each process's LOCAL shard.

    Multi-host path: every process passes only its own slice of the global
    batch (see ``distributed.local_batch_slice``); the returned arrays are
    global jax.Arrays sharded over ``axis`` across all processes.  Falls back
    to a plain device_put in single-process jobs.
    """
    out = {}
    for k, v in local_batch.items():
        sh = batch_sharding(mesh, np.ndim(v), axis)
        if jax.process_count() > 1:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sh)
    return out


def replicate_to_mesh(tree, mesh: Mesh):
    """Re-place a pytree (e.g. a restored TrainState) replicated over ``mesh``.

    Checkpoints restore committed to the process's device 0; a shard_map-jitted
    step then refuses to mix that placement with a mesh-sharded batch.  This is
    the topology-portability half of the reference's restore contract
    (``train.py:57-58``): a snapshot written under ANY topology re-places onto
    the current one.  Multi-host safe (each process holds the full replica).
    """
    sh = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(jax.device_get(x))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def data_parallel_step(step_fn, mesh: Mesh, axis: str = DATA_AXIS, donate_state: bool = True):
    """Wrap a per-shard (state, batch) -> (state, metrics) step with shard_map.

    ``step_fn`` must have been built with ``axis_name=axis`` so it pmean-reduces
    gradients/metrics itself.  State is replicated; every leading batch dim is
    sharded over ``axis``.
    """
    batch_spec = P(axis)
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())
