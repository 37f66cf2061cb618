"""Fused Pallas TPU kernels for the Caffe max-pool backward.

XLA's stock VJP of reduce_window-max is SelectAndScatter, which the TPU
runs as a windowed scan at ~1/3 of HBM bandwidth — 5.6 ms/step across the
five stage-1 pools at the batch-20 @ 321^2 geometry
(``artifacts/step_profile_r05.json``).  Two pure-XLA elementwise
reformulations of the same routing were measured on the real chip and BOTH
lose (see ``ops/pooling.py``): XLA refuses to fuse the -inf halo pads, the
interior-dilated placement pads, and the stack+reshape interleave, running
them as standalone data-formatting ops.  These kernels do the identical
first-max routing entirely in VMEM, where those data movements are free.

Routing semantics (pinned bit-identical to SelectAndScatter on integer
data by ``tests/test_pallas_pool.py``): every window's cotangent goes to
the window's FIRST maximum in scan order — Caffe's stored-argmax
(``PoolingLayer::Backward_cpu``) and XLA's GE-select order.  The shipped
pooling is separable (W pass then H pass, ``ops/pooling.caffe_max_pool``),
so the backward is H-routing of the cotangent against the W-pooled
intermediate, then W-routing against the raw input.

Kernel design — NO halos, NO strided memory ops:

  * each 1-D routing pass works in the pass's INPUT domain: window maxes
    anchored at window centers (``cmax``), per-tap hit tests, and the
    first-max cascade are all static shifts (slice+concat with edge fill),
    parity/range iota masks, and elementwise selects;
  * the o-domain cotangent is upsampled to the input domain with one
    ``repeat`` (``g_rep[j] = g[j // s]``) and read through the same shifts;
  * ``pool_bwd_h`` routes along H (a *batch* dim of the (1, H, wb, C)
    block) and is gridded over pooled-W tiles — no W interaction, so tile
    edges need no halo; ``pool_bwd_w`` routes along W (the sublane dim)
    and is gridded over H rows — no H interaction.  Overlapping-window
    writes never cross grid blocks because each program writes only the
    input rows/columns it fully owns.

HBM traffic per pool backward = read x + yW + g(+rep) + write gW + gx — at
the stage-1 geometry ~2.1 GB total vs SelectAndScatter's ~1/3-bandwidth
scan (measured numbers in STATUS.md round 5).

Reference parity anchor: the pooling geometry/divisor semantics mirror
``training/experiment/seed_mc/train-s.prototxt`` (pool1-3 3x3/s2/p1,
pool4-5 3x3/s1/p1); routing mirrors Caffe's stored first argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_fill(a, delta: int, axis: int, fill):
    """out[j] = a[j + delta] along ``axis``; out-of-range positions take
    ``fill``.  Static slice + concat — both free inside VMEM."""
    if delta == 0:
        return a
    length = a.shape[axis]
    d = abs(delta)
    if d >= length:
        return jnp.full(a.shape, fill, a.dtype)
    pad_shape = list(a.shape)
    pad_shape[axis] = d
    pad = jnp.full(pad_shape, fill, a.dtype)
    if delta > 0:
        core = jax.lax.slice_in_dim(a, d, length, axis=axis)
        return jax.lax.concatenate([core, pad], axis)
    core = jax.lax.slice_in_dim(a, 0, length - d, axis=axis)
    return jax.lax.concatenate([pad, core], axis)


def _upsample_h(g, s: int):
    """g_rep[:, j] = g[:, j // s] (full length s * O — windows whose center
    lies in the pad region index past the input length, so truncation
    happens only after the per-tap shift in ``_route_1d``).

    Element-repeat, NOT tile: ``pltpu.repeat`` tiles (abab — measured on
    chip), so this is a jnp.repeat, which on the H axis lowers to a
    batch-dim broadcast+reshape (free in Mosaic).  The W-axis equivalent
    would reshape the sublane dim, so the W pass upsamples in XLA instead
    (``pool_bwd_w``)."""
    return g if s == 1 else jnp.repeat(g, s, axis=1)


def _route_1d(xv, g_rep, axis: int, o_len: int, k: int, s: int, p: int):
    """First-max routed backward of one 1-D max-pool pass, input domain.

    ``xv``: the pass input (length L along ``axis``); ``g_rep``: the
    cotangent upsampled so ``g_rep[j] = g[j // s]``.  Returns the routed
    cotangent at every input position:

        gx[j] = sum_t [j is tap t of window o=(j+p-t)/s]
                      * [xv[j] == window-max(o)]
                      * [no tap t' < t of window o hit]
                      * g[o]
    """
    neg = jnp.asarray(-jnp.inf, xv.dtype)
    zero = jnp.asarray(0, g_rep.dtype)
    one = jnp.asarray(1, g_rep.dtype)
    length = xv.shape[axis]

    # shifted input copies: sh[d][j] = xv[j + d] (OOB -> -inf); the window
    # that holds j as tap t spans [j - t, j - t + k), so its max is a max
    # of k of these — valid even for windows whose center/tail lies in the
    # pad region (where a center-anchored sliding max has no index)
    sh = {d: (_shift_fill(xv, d, axis, neg) if d else xv)
          for d in range(-(k - 1), k)}

    pos = jax.lax.broadcasted_iota(jnp.int32, xv.shape, axis)
    hits = []
    terms = []
    for t in range(k):
        off = p - t  # j + off == o*s for the window this tap belongs to
        o_scaled = pos + off
        sel = (o_scaled >= 0) & (o_scaled <= (o_len - 1) * s)
        if s > 1:
            sel = sel & (o_scaled % s == 0)
        wm = None
        for u in range(k):
            v = sh[u - t]
            wm = v if wm is None else jnp.maximum(wm, v)
        # 0/1 in the cotangent dtype (exact): Mosaic cannot shift/concat
        # i1 mask vectors, and the first-max cascade is exact arithmetic
        # on {0, 1} in any float dtype
        hits.append(jnp.where(sel & (xv == wm), one, zero))
        # g_rep may be longer than the input (s*O >= L): shift THEN trim,
        # so pad-region window indices j + off in [L, s*O) still resolve
        gu = _shift_fill(g_rep, off, axis, zero)
        if gu.shape[axis] != length:
            gu = jax.lax.slice_in_dim(gu, 0, length, axis=axis)
        terms.append(gu)

    acc = None
    for t in range(k):
        first = hits[t]
        for tp in range(t):
            # tap t' of the same window sits delta = t - tp positions
            # earlier; shifted-out rows are halo taps (never hit) -> False
            earlier = _shift_fill(hits[tp], -(t - tp), axis, zero)
            first = first * (one - earlier)
        term = first * terms[t]
        acc = term if acc is None else acc + term
    return acc


def _bwd_h_kernel(o_len, k, s, p, yw_ref, g_ref, out_ref):
    g_rep = _upsample_h(g_ref[...], s)
    out_ref[...] = _route_1d(yw_ref[...], g_rep, 1, o_len, k, s, p)


def _bwd_w_kernel(o_len, k, s, p, x_ref, gw_rep_ref, out_ref):
    out_ref[...] = _route_1d(x_ref[...], gw_rep_ref[...], 2, o_len, k, s, p)


def _block(n: int, target: int = 16) -> int:
    return n if n <= target else target


@functools.partial(jax.jit, static_argnames=("k", "s", "p"))
def pool_bwd_h(yw, g, k: int, s: int, p: int):
    """Route ``g`` (B, Ho, Wo, C) along H against ``yw`` (B, H, Wo, C)."""
    b, h, wo, c = yw.shape
    ho = g.shape[1]
    wb = _block(wo)
    kernel = functools.partial(_bwd_h_kernel, ho, k, s, p)
    return pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(wo, wb)),
        in_specs=[
            pl.BlockSpec((1, h, wb, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, wb, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wb, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(yw.shape, g.dtype),
        interpret=_interpret(),
    )(yw, g)


@functools.partial(jax.jit, static_argnames=("k", "s", "p"))
def pool_bwd_w(x, gw, k: int, s: int, p: int):
    """Route ``gw`` (B, H, Wo, C) along W against ``x`` (B, H, W, C).

    The o->input-domain upsample along W (the sublane dim) happens in XLA
    (one relayout copy) — Mosaic has no element-repeat on sublanes."""
    b, h, w, c = x.shape
    wo = gw.shape[2]
    hb = _block(h)
    gw_rep = gw if s == 1 else jnp.repeat(gw, s, axis=2)
    wr = gw_rep.shape[2]
    kernel = functools.partial(_bwd_w_kernel, wo, k, s, p)
    return pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(h, hb)),
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wr, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, gw.dtype),
        interpret=_interpret(),
    )(x, gw_rep)
