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


def softmax_cross_entropy_ignore_sums(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = 255
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unnormalized (loss_sum, acc_sum, n_valid) over valid pixels.

    The sum form lets a data-parallel step psum the three terms across
    shards and divide once — the exact global VALID normalization even when
    shards carry different ignore/pad pixel counts (a per-shard mean of
    means is not).
    """
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.sum(valid).astype(jnp.float32)
    loss_sum = -jnp.sum(jnp.where(valid, picked, 0.0))
    pred = jnp.argmax(logits, axis=-1)
    acc_sum = jnp.sum(jnp.where(valid, (pred == safe_labels).astype(jnp.float32), 0.0))
    return loss_sum, acc_sum, n_valid


def softmax_cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = 255
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: (B, h, w, M); labels: (B, h, w) int. Returns (loss, accuracy)."""
    loss_sum, acc_sum, n_valid = softmax_cross_entropy_ignore_sums(
        logits, labels, ignore_label
    )
    n_valid = jnp.maximum(n_valid, 1)
    return loss_sum / n_valid, acc_sum / n_valid
