"""Stage-2 loss: softmax cross entropy with an ignore label.

Equivalent of Caffe's ``SoftmaxWithLoss`` with ``ignore_label: 255``
(``training/experiment/seed_mc/train-f.prototxt:732-744``): per-pixel CE over
valid pixels, normalized by the *valid pixel count* (Caffe's default
VALID normalization), plus the ``SegAccuracy``-style pixel accuracy metric
(``train-f.prototxt:745-754``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def softmax_cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = 255
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: (B, h, w, M); labels: (B, h, w) int. Returns (loss, accuracy)."""
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, picked, 0.0)) / n_valid
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum(jnp.where(valid, (pred == safe_labels).astype(jnp.float32), 0.0)) / n_valid
    return loss, acc
