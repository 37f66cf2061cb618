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

import os
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


def _mp1d_bwd_gather(axis, k, s, pads, res, g):
    """Gather-form routed backward: the same first-max routing as
    ``_mp1d_bwd`` (and SelectAndScatter) but written so XLA never sees the
    two ops it refuses to fuse — there is NO -inf halo pad of ``x`` and NO
    interior-dilated placement pad.  Instead:

    - each tap's window-hit test slices only the o-range whose tap lands
      inside the real array (edge windows whose tap falls in the conceptual
      -inf halo can never hit, so a False edge-pad of the hit mask is
      exact);
    - placement is inverted into a per-INPUT gather: input index i receives
      cotangent from tap t of window o = (i + pads[0] - t) / s, so for each
      residue class r = i mod s the contributions are plain shifted slices
      of the routed cotangents, and the s residue streams interleave back
      with one stack+reshape (a layout move, not a dilated pad).

    All pads that remain are non-interior zero/False edge pads of <= k
    rows, which XLA folds into loop fusions.
    """
    x, y = res
    pl, _ = pads
    in_len = x.shape[axis]
    out = y.shape[axis]
    zero = jnp.asarray(0, g.dtype)

    def _slice1d(a, start, count, stride=1):
        st = [0] * a.ndim
        li = list(a.shape)
        sr = [1] * a.ndim
        st[axis] = start
        li[axis] = start + (count - 1) * stride + 1
        sr[axis] = stride
        return jax.lax.slice(a, st, li, sr)

    def _edge_pad(a, lo, hi, value):
        if lo == 0 and hi == 0:
            return a
        cfg = [(0, 0, 0)] * a.ndim
        cfg[axis] = (lo, hi, 0)
        return jax.lax.pad(a, jnp.asarray(value, a.dtype), cfg)

    # routed cotangents per tap over the full window domain [0, out)
    taken = None
    c_taps = []
    for t in range(k):
        o_lo = max(0, (pl - t + s - 1) // s)
        o_hi = min(out, (in_len - 1 + pl - t) // s + 1)
        n_t = o_hi - o_lo
        if n_t <= 0:
            c_taps.append(None)
            continue
        x_t = _slice1d(x, o_lo * s - pl + t, n_t, s)
        hit = _edge_pad(x_t == _slice1d(y, o_lo, n_t), o_lo, out - o_hi, False)
        r_t = hit if taken is None else hit & ~taken
        taken = hit if taken is None else taken | hit
        c_taps.append(jnp.where(r_t, g, zero))

    # per-residue gather: i = m*s + r takes tap t of window m + (r+pl-t)/s
    out_max = (in_len + s - 1) // s
    streams = []
    for r in range(s):
        out_r = (in_len - r + s - 1) // s
        acc = None
        for t in range(k):
            if (t - pl - r) % s != 0 or c_taps[t] is None:
                continue
            d = (r + pl - t) // s
            m_lo = max(0, -d)
            m_hi = min(out_r, out - d)
            if m_hi <= m_lo:
                continue
            part = _edge_pad(
                _slice1d(c_taps[t], m_lo + d, m_hi - m_lo), m_lo, out_max - m_hi, 0
            )
            acc = part if acc is None else acc + part
        if acc is None:
            shp = list(g.shape)
            shp[axis] = out_max
            acc = jnp.zeros(shp, g.dtype)
        streams.append(acc)

    if s == 1:
        g_in = streams[0]
    else:
        g_in = jnp.stack(streams, axis=axis + 1)
        shp = list(x.shape)
        shp[axis] = out_max * s
        g_in = g_in.reshape(shp)
    if g_in.shape[axis] != in_len:
        start = [0] * x.ndim
        g_in = jax.lax.slice(g_in, start, list(x.shape))
    return (g_in,)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _max_pool_1d_gather(x, axis, k, s, pads):
    """``_max_pool_1d`` with the gather-form backward (``_mp1d_bwd_gather``).

    Same routing, pad-free formulation; selected by
    ``caffe_max_pool(..., grad_mode="gather")`` / ``DSRG_POOL_GRAD=gather``.
    """
    return _reduce_window_max_1d(x, axis, k, s, pads)


_max_pool_1d_gather.defvjp(_mp1d_fwd, _mp1d_bwd_gather)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _max_pool_sep_pallas(x, k, s, ph, pw):
    """Separable Caffe max pool whose backward runs the fused Pallas
    routing kernels (``ops/pallas_pool.py``) — same first-max routing as
    SelectAndScatter, computed in VMEM instead of XLA's ~1/3-bandwidth
    windowed scan.  Forward is the stock pair of 1-D reduce_windows."""
    yw = _reduce_window_max_1d(x, 2, k, s, pw)
    return _reduce_window_max_1d(yw, 1, k, s, ph)


def _mp_sep_pallas_fwd(x, k, s, ph, pw):
    yw = _reduce_window_max_1d(x, 2, k, s, pw)
    y = _reduce_window_max_1d(yw, 1, k, s, ph)
    return y, (x, yw)


def _mp_sep_pallas_bwd(k, s, ph, pw, res, g):
    from dsrg_tpu.ops.pallas_pool import pool_bwd_h, pool_bwd_w

    x, yw = res
    gw = pool_bwd_h(yw, g, k, s, ph[0])
    return (pool_bwd_w(x, gw, k, s, pw[0]),)


_max_pool_sep_pallas.defvjp(_mp_sep_pallas_fwd, _mp_sep_pallas_bwd)


def caffe_max_pool(x: jnp.ndarray, k: int = 3, stride: int = 2, pad: int = 1,
                   grad_mode: str | None = None) -> jnp.ndarray:
    """(B, H, W, C) max pooling with Caffe output-size semantics.

    Computed SEPARABLY — a 1-D column max then a 1-D row max — because max
    over a k x k window factors exactly; each 1-D pass routes its backward
    to the first row-max, then the first column max within that row —
    exactly the 2-D GE-select scan order (and Caffe's stored first argmax,
    ``PoolingLayer::Backward_cpu``).  Pinned incl. ties by
    ``tests/test_model.py::test_max_pool_separable_matches_2d``.

    ``grad_mode`` picks the VJP (default: ``DSRG_POOL_GRAD`` env or "sas"):

    - ``"sas"`` — SelectAndScatter, XLA's stock reduce_window-max VJP
      (measured 5.6 ms/step across the five stage-1 pools at ~1/3 of HBM
      bandwidth, ``artifacts/step_profile_r05.json``);
    - ``"pallas"`` — the fused Pallas routing kernels
      (``ops/pallas_pool.py``), bit-identical routing computed in VMEM;
    - ``"gather"`` — a pad-free routed elementwise XLA backward
      (``_mp1d_bwd_gather``), measured 42.9 vs SAS 15.1 ms on the isolated
      pools phase (the interleave/edge pads still materialize) — kept as a
      second negative result pinning why the Pallas kernel exists;
    - ``"pad"`` — the first routed attempt (``_max_pool_1d``), measured
      2x WORSE than SAS on the real chip (XLA materializes its -inf halo
      and interior-dilated placement pads as ~55 ms/step of standalone
      data formatting); kept as the routing spec + negative result.
    """
    if grad_mode is None:
        grad_mode = os.environ.get("DSRG_POOL_GRAD", "sas")
    h, w = x.shape[1], x.shape[2]
    _, ph = _caffe_pool_geometry(h, k, stride, pad)
    _, pw = _caffe_pool_geometry(w, k, stride, pad)
    if grad_mode == "pallas":
        return _max_pool_sep_pallas(x, k, stride, tuple(ph), tuple(pw))
    if grad_mode != "sas":
        pool1d = {"gather": _max_pool_1d_gather, "pad": _max_pool_1d}[grad_mode]
        y = pool1d(x, 2, k, stride, tuple(pw))
        return pool1d(y, 1, k, stride, tuple(ph))
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
