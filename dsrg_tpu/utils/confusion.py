"""Segmentation evaluation: confusion matrix, mIoU, recall, accuracy.

API/semantics parity with the reference evaluator
(``training/tools/evaluate.py:17-68``):

* ``generateM``-style per-image matrices ignore pixels with ``gt >= nclass``
  (covers the VOC 255 boundary label);
* ``jaccard()`` averages IoU only over classes whose diagonal entry is
  non-zero (``evaluate.py:52-59``) — reproduced even though it's a quirky
  convention — and returns ``(mean_iou, per_class_list, matrix)``;
* ``recall``/``accuracy`` are the column/row diagonal ratios averaged over
  all classes.

The per-image matrix is vectorized with ``bincount`` (like
``test-coco.py:62-81``) instead of the reference's per-pixel Python loop in a
multiprocessing pool.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def confusion_matrix_np(gt: np.ndarray, pred: np.ndarray, nclass: int) -> np.ndarray:
    """Vectorized (nclass, nclass) confusion matrix; gt >= nclass is ignored."""
    gt = np.asarray(gt).ravel().astype(np.int64)
    pred = np.asarray(pred).ravel().astype(np.int64)
    # out-of-range predictions (e.g. the 255 "unseeded" marker in cue masks)
    # are ignored along with out-of-range ground truth
    valid = (gt < nclass) & (pred < nclass)
    idx = gt[valid] * nclass + pred[valid]
    return np.bincount(idx, minlength=nclass * nclass).reshape(nclass, nclass).astype(np.float64)


def confusion_matrix_jax(gt, pred, nclass: int):
    """On-device (nclass, nclass) confusion matrix for in-loop validation.

    jit/vmap-friendly: invalid pixels (gt or pred outside [0, nclass)) are
    scattered to a discard row.  Sum per-batch matrices with ``psum`` for
    data-parallel evaluation (replaces the reference's multiprocessing-pool
    per-image matrices, evaluate.py:148-156).
    """
    import jax.numpy as jnp

    gt = jnp.ravel(gt).astype(jnp.int32)
    pred = jnp.ravel(pred).astype(jnp.int32)
    valid = (gt >= 0) & (gt < nclass) & (pred >= 0) & (pred < nclass)
    idx = jnp.where(valid, gt * nclass + pred, nclass * nclass)
    counts = jnp.zeros(nclass * nclass + 1, jnp.float32).at[idx].add(1.0)
    return counts[:-1].reshape(nclass, nclass)


class ConfusionMatrix:
    """Mirror of the reference's ConfusionMatrix (evaluate.py:17-68)."""

    def __init__(self, nclass: int, classes: Optional[List[str]] = None):
        self.nclass = nclass
        self.classes = classes
        self.M = np.zeros((nclass, nclass), dtype=np.float64)

    def add(self, gt, pred) -> None:
        self.M += confusion_matrix_np(gt, pred, self.nclass)

    def addM(self, matrix: np.ndarray) -> None:
        assert matrix.shape == self.M.shape
        self.M += matrix

    def generateM(self, item) -> np.ndarray:
        gt, pred = item
        return confusion_matrix_np(gt, pred, self.nclass)

    def recall(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.diag(self.M) / self.M.sum(axis=0)
        return float(np.sum(r) / self.nclass)

    def accuracy(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            a = np.diag(self.M) / self.M.sum(axis=1)
        return float(np.sum(a) / self.nclass)

    def jaccard(self) -> Tuple[float, List[float], np.ndarray]:
        jaccard_perclass = []
        for i in range(self.nclass):
            if self.M[i, i] != 0:
                denom = self.M[i, :].sum() + self.M[:, i].sum() - self.M[i, i]
                jaccard_perclass.append(float(self.M[i, i] / denom))
        mean = float(np.sum(jaccard_perclass) / len(jaccard_perclass))
        return mean, jaccard_perclass, self.M
