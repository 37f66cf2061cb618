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

from functools import partial

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


def _reduce_window_max_1d(x, axis, k, s, pads):
    dims = [1] * x.ndim
    dims[axis] = k
    strides = [1] * x.ndim
    strides[axis] = s
    padding = [(0, 0)] * x.ndim
    padding[axis] = tuple(pads)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=tuple(dims),
        window_strides=tuple(strides),
        padding=tuple(padding),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _max_pool_1d(x, axis, k, s, pads):
    """1-D max pool along ``axis`` whose BACKWARD is pure elementwise math.

    XLA's stock VJP of reduce_window-max is SelectAndScatter, which the TPU
    runs as a windowed scan at ~1/3 of HBM bandwidth (measured 5.6 ms/step
    across the five stage-1 pools, ``artifacts/step_profile_r05.json``).
    The same routing — each window's cotangent goes to the window's FIRST
    maximum, Caffe's stored-argmax semantics and SelectAndScatter's
    GE-select scan order — is computable with k strided slices and a
    first-max cascade: tap t takes the cotangent iff x_t == y and no tap
    before it matched.  Placing each tap's routed cotangents back is an
    interior-dilated lax.pad (negative edge padding trims windows whose tap
    falls in the -inf halo, where x_t == y is impossible anyway).

    MEASURED AND NOT ADOPTED (round 5, real chip): XLA does not fuse the
    -inf halo pad or the interior-dilated placement pads — they run as
    standalone data-formatting ops (~55 ms/step at the stage-1 geometry,
    blowing the step from 101.5 to 191.3 ms).  Kept, with routing pinned
    bit-identical to SelectAndScatter on integer data
    (``tests/test_model.py::test_max_pool_routed_grad_*``), as the
    reference semantics for a future Pallas kernel that fuses this math in
    VMEM.
    """
    return _reduce_window_max_1d(x, axis, k, s, pads)


def _mp1d_fwd(x, axis, k, s, pads):
    y = _reduce_window_max_1d(x, axis, k, s, pads)
    return y, (x, y)


def _mp1d_bwd(axis, k, s, pads, res, g):
    x, y = res
    pl, _ = pads
    in_len = x.shape[axis]
    out = y.shape[axis]
    halo = [(0, 0, 0)] * x.ndim
    halo[axis] = (pl, max((out - 1) * s + k - pl - in_len, 0), 0)
    xp = jax.lax.pad(x, jnp.asarray(-jnp.inf, x.dtype), halo)
    taken = None
    g_in = None
    zero = jnp.asarray(0, g.dtype)
    for t in range(k):
        start = [0] * x.ndim
        limit = list(xp.shape)
        strides = [1] * x.ndim
        start[axis] = t
        limit[axis] = t + (out - 1) * s + 1
        strides[axis] = s
        x_t = jax.lax.slice(xp, start, limit, strides)
        hit = x_t == y
        r_t = hit if taken is None else hit & ~taken
        taken = hit if taken is None else taken | hit
        c_t = jnp.where(r_t, g, zero)
        place = [(0, 0, 0)] * x.ndim
        lo = t - pl
        place[axis] = (lo, in_len - (lo + (out - 1) * s + 1), s - 1)
        placed = jax.lax.pad(c_t, zero, place)
        g_in = placed if g_in is None else g_in + placed
    return (g_in,)


_max_pool_1d.defvjp(_mp1d_fwd, _mp1d_bwd)


def caffe_max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2, pad: int = 1) -> jnp.ndarray:
    """(B, H, W, C) max pooling with Caffe output-size semantics.

    Computed SEPARABLY — a 1-D column max then a 1-D row max — because max
    over a k x k window factors exactly; each 1-D pass routes its backward
    to the first row-max, then the first column max within that row —
    exactly the 2-D GE-select scan order (and Caffe's stored first argmax,
    ``PoolingLayer::Backward_cpu``).  Pinned incl. ties by
    ``tests/test_model.py::test_max_pool_separable_matches_2d``.

    The backward is SelectAndScatter (XLA's stock reduce_window-max VJP).
    A routed elementwise alternative (``_max_pool_1d``) was built and
    measured on the real chip and LOSES 2x: XLA keeps its -inf halo pad and
    interior-dilated placement pads as standalone data-formatting ops
    (~55 ms/step of `pad` at the stage-1 geometry vs the 5.6 ms it tried to
    save) — see STATUS.md round 5.  The code is kept (tested bit-equivalent
    in routing) for a future Pallas fusion of the same math.
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
