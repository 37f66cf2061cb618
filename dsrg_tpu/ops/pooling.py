"""Caffe-semantics pooling on NHWC tensors.

Caffe computes the pooled size as ``ceil((H + 2*pad - k) / stride) + 1`` and
clips the last window so it starts inside the padded extent.  MAX pooling
ignores the pad region (conceptually -inf padding); AVE pooling sums real
pixels only but divides by the window's intersection with the *padded* extent
``[0, H + pad)`` — for the reference's 3x3/pad-1 configurations that divisor
is always 9, but we compute the general divisor map so other shapes are
correct too.

Reference usage (``training/experiment/seed_mc/train-s.prototxt``): pool1-3
MAX 3x3 stride-2 pad-1; pool4/pool5 MAX 3x3 *stride-1* pad-1; pool5a AVE 3x3
stride-1 pad-1 — the LargeFOV trick that keeps the stride-8 resolution.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _caffe_pool_geometry(size: int, k: int, s: int, p: int):
    out = int(np.ceil((size + 2 * p - k) / s)) + 1
    if p > 0 and (out - 1) * s >= size + p:
        out -= 1
    # explicit asymmetric padding covering every window
    pad_high = max((out - 1) * s + k - p - size, 0)
    return out, (p, pad_high)


def _max_pool_2d(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """Single 2-D windowed reduce (the textbook formulation, kept as the
    oracle for the separable fast path below and for profiling its VJP)."""
    h, w = x.shape[1], x.shape[2]
    _, ph = _caffe_pool_geometry(h, k, stride, pad)
    _, pw = _caffe_pool_geometry(w, k, stride, pad)
    # NB: the init value must be a scalar literal (not an array) so JAX
    # pattern-matches the differentiable reduce_window_max primitive.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), ph, pw, (0, 0)),
    )


def caffe_max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2, pad: int = 1) -> jnp.ndarray:
    """(B, H, W, C) max pooling with Caffe output-size semantics.

    Computed SEPARABLY — a 1-D column max then a 1-D row max — because max
    over a k x k window factors exactly, and on TPU the backward of each 1-D
    reduce_window is a k-element SelectAndScatter scan instead of the 2-D
    k^2-element one (and the second pass runs on the already-shrunk
    intermediate).  Measured on the five pools of the batch-20 @ 321^2
    stage-1 step: fwd+bwd 14.5 ms (2-D) -> see STATUS.md (separable), with
    bit-identical forwards AND gradients: 1-D SAS routes each window's
    cotangent to its first row-max, then to the first column max within that
    row — exactly the 2-D GE-select scan order (and Caffe's stored first
    argmax, ``PoolingLayer::Backward_cpu``).  Pinned incl. ties by
    ``tests/test_model.py::test_max_pool_separable_matches_2d``.
    """
    h, w = x.shape[1], x.shape[2]
    _, ph = _caffe_pool_geometry(h, k, stride, pad)
    _, pw = _caffe_pool_geometry(w, k, stride, pad)
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, k, 1),
        window_strides=(1, 1, stride, 1),
        padding=((0, 0), (0, 0), pw, (0, 0)),
    )
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, 1, 1),
        window_strides=(1, stride, 1, 1),
        padding=((0, 0), ph, (0, 0), (0, 0)),
    )


def _caffe_avg_divisor(size: int, out: int, k: int, s: int, p: int) -> np.ndarray:
    """Per-position divisor: window length clipped to the padded extent [.., size+p]."""
    starts = np.arange(out) * s - p
    ends = np.minimum(starts + k, size + p)
    return (ends - starts).astype(np.float32)


def caffe_avg_pool(x: jnp.ndarray, k: int = 3, stride: int = 1, pad: int = 1) -> jnp.ndarray:
    """(B, H, W, C) average pooling with Caffe divisor semantics."""
    h, w = x.shape[1], x.shape[2]
    oh, ph = _caffe_pool_geometry(h, k, stride, pad)
    ow, pw = _caffe_pool_geometry(w, k, stride, pad)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), ph, pw, (0, 0)),
    )
    div_h = _caffe_avg_divisor(h, oh, k, stride, pad)
    div_w = _caffe_avg_divisor(w, ow, k, stride, pad)
    div = jnp.asarray(div_h[:, None] * div_w[None, :], dtype=x.dtype)
    return summed / div[None, :, :, None]
