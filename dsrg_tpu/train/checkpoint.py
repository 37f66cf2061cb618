"""Checkpoint / resume / warm-start.

Covers the reference's solver-snapshot contract (``SURVEY.md`` §5):

* ``save``/``restore``: full train state (params + optimizer velocity + PRNG
  + step), the ``.caffemodel``+``.solverstate`` pair's equivalent
  (``solver-s.prototxt:16-17``, ``train.py:57-58``), via orbax.
* ``copy_from``: Caffe's ``net.copy_from(weights)`` partial warm start
  (``train.py:59-62``) — copy leaves whose module name and shape match,
  silently keep everything else (how stage 2 inherits stage 1's weights and
  how the ImageNet VGG16 init flows in, ``run.sh:5,9``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dsrg_tpu.train.train_state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> str:
    path = os.path.join(_abs(ckpt_dir), f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path


class AsyncCheckpointWriter:
    """Non-blocking snapshot writes for long runs (VERDICT r1 item 9).

    The reference's solver blocks while Caffe serializes a snapshot
    (``solver-s.prototxt:16-17``); at the 8k/20k-iteration recipe scale a
    synchronous orbax write stalls the device pipeline for seconds.  This
    writer snapshots the arrays and returns immediately; serialization
    happens on orbax's background thread.  ``save`` waits for the PREVIOUS
    write first (at most one outstanding snapshot), and ``close`` drains.
    The synchronous :func:`save_checkpoint` stays for tests and scripts that
    need the file on return.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, ckpt_dir: str, state: TrainState, step: int) -> str:
        self._ckptr.wait_until_finished()
        path = os.path.join(_abs(ckpt_dir), f"step_{step}")
        self._ckptr.save(path, args=ocp.args.StandardSave(state))
        return path

    def save_params(self, path: str, params: Any) -> str:
        self._ckptr.wait_until_finished()
        self._ckptr.save(_abs(path), args=ocp.args.StandardSave(params))
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.close()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), template)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpt_dir = _abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def save_params(path: str, params: Any) -> str:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abs(path), jax.device_get(params))
    return path


def load_params(path: str, template: Any = None) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            # Template-free restore is deliberate here (eval tools load
            # checkpoints whose tree they don't know yet); orbax rebuilds
            # the tree from its own metadata.  Scope-filter the UNSAFE
            # warning it prints for that case so every CLI run isn't noisy.
            import logging

            class _Quiet(logging.Filter):
                def filter(self, record):
                    return "target tree to be provided" not in record.getMessage()

            flt = _Quiet()
            logger = logging.getLogger("absl")
            logger.addFilter(flt)
            try:
                return ckptr.restore(_abs(path))
            finally:
                logger.removeFilter(flt)
        return ckptr.restore(_abs(path), template)


def copy_from(target_params: Any, source_params: Any, verbose: bool = True) -> Any:
    """Partial parameter copy by module name + shape (net.copy_from parity)."""
    target = jax.tree.map(lambda x: x, target_params)  # shallow rebuild

    def merge(dst: dict, src: dict, prefix: str = "") -> dict:
        out = {}
        for key, val in dst.items():
            if key in src:
                sval = src[key]
                if isinstance(val, dict) and isinstance(sval, dict):
                    out[key] = merge(val, sval, prefix + key + "/")
                elif hasattr(val, "shape") and hasattr(sval, "shape") and val.shape == tuple(
                    np.shape(sval)
                ):
                    out[key] = jax.numpy.asarray(sval, dtype=val.dtype)
                else:
                    if verbose:
                        print(f"copy_from: shape mismatch at {prefix + key}, keeping init")
                    out[key] = val
            else:
                if verbose:
                    print(f"copy_from: {prefix + key} not in source, keeping init")
                out[key] = val
        return out

    return merge(target, source_params)
