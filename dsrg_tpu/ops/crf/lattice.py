"""Compact sparse bilateral lattice for full-resolution dense-CRF filtering.

The dense bilateral grid (``grid.py``) allocates every cell of the 5-D
(y, x, b, g, r) volume — ~10-20x more cells than are actually occupied — so
its blur/slice passes move an order of magnitude more HBM than necessary.
This module keeps only *occupied* cells, the same truncation the reference's
permutohedral lattice makes (``CRF/src/permutohedral.cpp``: only vertices
allocated during splat participate in the blur), but built from sorted arrays
instead of a linear-probing hash table:

  * cell ids: flattened 5-D nearest-cell coordinates per pixel, sorted once
    (``jnp.sort``) with duplicates collapsed to a +inf sentinel tail —
    ``searchsorted`` over this array is the TPU-native replacement for the
    reference's hash lookups;
  * splat: segment-sum of pixel values into their (sorted) cell slot;
  * blur: separable 5-axis Gaussian over occupied cells; each axis gathers
    the +-1/+-2 neighbors found by ``searchsorted`` (missing neighbors
    contribute zero, exactly the permutohedral truncation);
  * slice: multilinear over the 32 surrounding cells with a validity mask.

Symmetric normalization runs through the identical approximate filter, so
systematic mass truncation cancels to first order (same argument as the
reference engine's NORMALIZE_SYMMETRIC).

All shapes are static: the compact table has exactly N slots (duplicate
pixels share a slot; unused tail slots hold a sentinel and never match).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.ops.crf.grid import _axis_blur_matrix, _grid_geometry, separable_gaussian_filter

_BLUR_R = 2
_BLUR_W = np.exp(-0.5 * np.arange(-_BLUR_R, _BLUR_R + 1) ** 2).astype(np.float32)


def _positions_in_sorted(cells: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """searchsorted(cells, queries, side='right') for a sorted ``cells``.

    Implemented as ONE merge argsort + cumsum + scatter instead of per-query
    binary search: TPU binary search is a sequence of random gathers
    (descriptor-bound); a bitonic sort of the concatenated array is
    contiguous VPU work and ~20x faster at lattice scales.
    """
    n = cells.shape[0]
    nq = queries.shape[0]
    merged = jnp.concatenate([cells, queries])
    perm = jnp.argsort(merged, stable=True)  # ties: cells (lower index) first
    isq = perm >= n
    c_before = jnp.cumsum((~isq).astype(jnp.int32))  # inclusive C-count == exclusive at query slots
    qorig = jnp.where(isq, perm - n, nq)  # non-queries dropped via OOB scatter
    out = jnp.zeros(nq, jnp.int32)
    return out.at[qorig].set(c_before.astype(jnp.int32), mode="drop")


class CompactLatticePlan:
    """Image-dependent splat/blur/slice geometry over occupied cells only."""

    def __init__(self, guide: jnp.ndarray, sigma_xy: float, sigma_rgb: float):
        h, w, _ = guide.shape
        self.h, self.w = h, w
        n = h * w
        gy, gx, gc, pad = _grid_geometry(h, w, sigma_xy, sigma_rgb)
        dims = (gy, gx, gc, gc, gc)
        strides = np.array(
            [dims[1] * dims[2] * dims[3] * dims[4],
             dims[2] * dims[3] * dims[4],
             dims[3] * dims[4], dims[4], 1], dtype=np.int32,
        )

        ys = jnp.arange(h, dtype=jnp.float32)[:, None] / sigma_xy + pad
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] / sigma_xy + pad
        coords = jnp.stack(
            [
                jnp.broadcast_to(ys, (h, w)),
                jnp.broadcast_to(xs, (h, w)),
                guide[..., 0] / sigma_rgb + pad,
                guide[..., 1] / sigma_rgb + pad,
                guide[..., 2] / sigma_rgb + pad,
            ],
            axis=-1,
        ).reshape(n, 5)

        dims_arr = jnp.asarray(dims, jnp.int32)
        strides_j = jnp.asarray(strides)
        nearest = jnp.clip(jnp.round(coords).astype(jnp.int32), 0, dims_arr - 1)
        flat = nearest @ strides_j  # (N,)

        sentinel = jnp.asarray(np.int32(np.prod(dims) + 10))
        sorted_flat = jnp.sort(flat)
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_flat[1:] != sorted_flat[:-1]]
        )
        # unique cell ids packed to the front, sentinel tail (second sort)
        self.cells = jnp.sort(jnp.where(is_first, sorted_flat, sentinel))  # (N,)

        # all lookups resolved by ONE merge-rank pass: 20 blur-neighbor
        # arrays, 32 slice-corner arrays, and the pixel->slot mapping
        neighbor_ids = []
        for axis in range(5):
            for off in range(-_BLUR_R, _BLUR_R + 1):
                if off == 0:
                    continue
                neighbor_ids.append(self.cells + off * strides[axis])

        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, dims_arr - 2)
        frac = coords - lo.astype(jnp.float32)
        corner_ids, corner_wgt = [], []
        for corner in range(32):
            bits = jnp.asarray([(corner >> d) & 1 for d in range(5)], jnp.int32)
            corner_ids.append((lo + bits[None, :]) @ strides_j)
            corner_wgt.append(
                jnp.prod(jnp.where(bits[None, :] == 1, frac, 1.0 - frac), axis=-1)
            )

        queries = jnp.concatenate(neighbor_ids + corner_ids + [flat])
        pos_right = _positions_in_sorted(self.cells, queries)
        slot = jnp.clip(pos_right - 1, 0, n - 1)
        valid = (pos_right > 0) & (self.cells[slot] == queries)

        nb_slot = slot[: 20 * n].reshape(20, n)
        nb_ok = valid[: 20 * n].reshape(20, n)
        c_slot = slot[20 * n : 52 * n].reshape(32, n)
        c_ok = valid[20 * n : 52 * n].reshape(32, n)
        self.pixel_slot = slot[52 * n :]

        self.nb_slots = nb_slot  # (20, N)
        self.nb_valid = nb_ok  # (20, N) bool
        self.corner_slots = c_slot  # (32, N)
        self.corner_w = jnp.where(c_ok, jnp.stack(corner_wgt), 0.0)  # (32, N)

        self.n = n
        self.blur_w = jnp.asarray(_BLUR_W)

    def filter(self, values: jnp.ndarray) -> jnp.ndarray:
        """Approximate K @ values for (H, W, C) values."""
        h, w, c = values.shape
        flat = values.reshape(self.n, c)

        table = jax.ops.segment_sum(flat, self.pixel_slot, num_segments=self.n)

        offs = [o for o in range(-_BLUR_R, _BLUR_R + 1) if o != 0]
        w_off = jnp.asarray(
            [_BLUR_W[j] for j, o in enumerate(range(-_BLUR_R, _BLUR_R + 1)) if o != 0]
        )
        n_off = len(offs)
        for axis in range(5):
            sl = self.nb_slots[axis * n_off : (axis + 1) * n_off]  # (n_off, N)
            ok = self.nb_valid[axis * n_off : (axis + 1) * n_off]
            contrib = jnp.take(table, sl.reshape(-1), axis=0).reshape(n_off, self.n, c)
            contrib = jnp.where(ok[:, :, None], contrib, 0.0)
            table = self.blur_w[_BLUR_R] * table + jnp.einsum(
                "o,onc->nc", w_off, contrib
            )

        gathered = jnp.take(table, self.corner_slots.reshape(-1), axis=0)
        gathered = gathered.reshape(32, self.n, c)
        out = jnp.sum(gathered * self.corner_w[:, :, None], axis=0)
        return out.reshape(h, w, c)


def mean_field_lattice(
    unary: jnp.ndarray,
    image: jnp.ndarray,
    n_iters: int = 10,
    scale_factor: float = 1.0,
    color_factor: float = 13.0,
    w_bilateral: float = 10.0,
    w_spatial: float = 3.0,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Compact-lattice mean field with the reference CRF() parameterization.

    ``valid_mask``: optional (H, W) {0,1} mask for padded batch members —
    invalid pixels are excluded from both kernels (masked splat + masked
    symmetric normalization), so batching differently-sized images onto a
    common canvas is exact for the valid region.
    """
    h, w, m = unary.shape
    img = jnp.round(image.astype(jnp.float32))
    plan = CompactLatticePlan(img, 80.0 / scale_factor, color_factor)
    s_g = 3.0 / scale_factor

    mask = (
        jnp.ones((h, w, 1), jnp.float32)
        if valid_mask is None
        else valid_mask.astype(jnp.float32)[..., None]
    )
    norm_b = jax.lax.rsqrt(plan.filter(mask) + 1e-20)
    norm_s = jax.lax.rsqrt(separable_gaussian_filter(mask, s_g) + 1e-20)

    def message(q):
        qm = q * mask
        mb = norm_b * plan.filter(norm_b * qm)
        ms = norm_s * separable_gaussian_filter(norm_s * qm, s_g)
        return (w_bilateral * mb + w_spatial * ms) * mask

    q = jax.nn.softmax(unary, axis=-1)

    def body(_, q):
        return jax.nn.softmax(unary + message(q), axis=-1)

    return jax.lax.fori_loop(0, n_iters, body, q)
