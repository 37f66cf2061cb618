"""Fused dense-CRF mean-field as a Pallas TPU kernel.

The XLA path (``exact.py``) materializes the two N x N Gaussian kernel
matrices in HBM and re-reads them every mean-field iteration.  This kernel
instead keeps the whole per-image state — features, unary, Q — resident in
VMEM and *recomputes* kernel tiles on the fly (flash-attention style):

  for it in range(n_iters):
    for i_tile:                         # output rows
      for j_tile:                       # contraction
        D2 = ||f_i||^2 + ||f_j||^2 - 2 f_i f_j^T      (T x T, MXU)
        K  = exp(-0.5 * D2)                            (VPU)
        acc_i += K @ (norm_j * Q_j)                    (MXU, bf16 -> f32)
    Q = softmax(unary + w * norm .* acc)

HBM traffic per image drops from O(n_iters * N^2) kernel-matrix reads to a
single O(N * d) feature read — the kernel is MXU-compute-bound.  One grid
program per batch image; the batch parallelizes across programs.

Padding: rows beyond N get a huge staggered feature offset so every padded
pixel decouples (kernel weight exp(-big) = 0) from real pixels and from other
padded pixels; their Q values are garbage and sliced off at the end.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
_PAD_OFFSET = 1e4


def _pad_to(x: jnp.ndarray, n: int, axis: int, value: float = 0.0) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _mf_kernel(
    unary_ref, fb_ref, fs_ref, nb_ref, ns_ref, q_out, acc_ref, q_ref,
    *, n_tiles, n_iters, wb, ws,
):
    """One image per program.  Ref shapes (leading singleton = batch block):
    unary/q_out: (1, N, M); fb/fs: (1, N, 8); nb/ns: (1, N, 128);
    scratch acc/q: (N, M)."""

    def softmax_rows(x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - mx)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    q_ref[:] = softmax_rows(unary_ref[0])

    def accumulate_kernel_messages(feats_ref, norm_ref, weight):
        """acc += weight * norm .* (K @ (norm .* Q)) for one Gaussian kernel."""

        def i_body(i, _):
            fi = feats_ref[0, pl.ds(i * TILE, TILE), :]
            sq_i = jnp.sum(fi * fi, axis=-1, keepdims=True)  # (T, 1)

            def j_body(j, tile_acc):
                fj = feats_ref[0, pl.ds(j * TILE, TILE), :]
                sq_j = jnp.sum(fj * fj, axis=-1)  # (T,)
                # HIGHEST: full-fp32 distance — at DEFAULT (single-pass bf16)
                # the kernel weights are noisy enough to flip near-tied
                # argmaxes after 10 sharpening iterations.
                cross = jax.lax.dot_general(
                    fi, fj,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                d2 = sq_i - 2.0 * cross + sq_j.reshape(1, TILE)
                k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
                nq = (
                    norm_ref[0, pl.ds(j * TILE, TILE), 0:1]
                    * q_ref[pl.ds(j * TILE, TILE), :]
                )
                return tile_acc + jnp.dot(
                    k.astype(jnp.bfloat16),
                    nq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )

            tile = jax.lax.fori_loop(
                0, n_tiles, j_body,
                jnp.zeros((TILE, acc_ref.shape[-1]), jnp.float32),
            )
            ni = norm_ref[0, pl.ds(i * TILE, TILE), 0:1]
            acc_ref[pl.ds(i * TILE, TILE), :] += weight * ni * tile
            return 0

        jax.lax.fori_loop(0, n_tiles, i_body, 0)

    def iter_body(_, carry):
        acc_ref[:] = unary_ref[0]
        accumulate_kernel_messages(fb_ref, nb_ref, wb)
        accumulate_kernel_messages(fs_ref, ns_ref, ws)
        q_ref[:] = softmax_rows(acc_ref[:])
        return carry

    jax.lax.fori_loop(0, n_iters, iter_body, 0)
    q_out[0] = q_ref[:]


def _norms_xla(feats: jnp.ndarray) -> jnp.ndarray:
    """Symmetric norms 1/sqrt(K @ 1 + 1e-20), computed once in XLA (fp32)."""
    sq = jnp.sum(feats * feats, axis=-1)
    cross = jnp.dot(
        feats, feats.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * cross
    k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    return jax.lax.rsqrt(jnp.sum(k, axis=-1) + 1e-20)


@functools.partial(jax.jit, static_argnames=("w_b", "w_s", "n_iters", "interpret"))
def mean_field_pallas(
    unary: jnp.ndarray,
    feats_b: jnp.ndarray,
    feats_s: jnp.ndarray,
    w_b: float = 10.0,
    w_s: float = 3.0,
    n_iters: int = 10,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused mean field.

    unary: (B, N, M) scores (negated costs); feats_b: (B, N, 5);
    feats_s: (B, N, 2).  Returns (B, N, M) marginals.
    """
    b, n, m = unary.shape
    n_pad = int(math.ceil(n / TILE)) * TILE
    m_pad = max(int(math.ceil(m / TILE)) * TILE, TILE)
    n_tiles = n_pad // TILE

    def prep_feats(f):
        f = _pad_to(f.astype(jnp.float32), 8, axis=2)
        if n_pad > n:
            stag = (
                _PAD_OFFSET
                + jnp.arange(n_pad - n, dtype=jnp.float32)[None, :, None] * 100.0
            )
            pad_rows = jnp.broadcast_to(stag, (b, n_pad - n, f.shape[2]))
            f = jnp.concatenate([f, pad_rows], axis=1)
        return f

    fb = prep_feats(feats_b)
    fs = prep_feats(feats_s)
    un = _pad_to(
        _pad_to(unary.astype(jnp.float32), m_pad, axis=2, value=-1e9), n_pad, axis=1
    )

    norms_b = jax.vmap(_norms_xla)(fb)
    norms_s = jax.vmap(_norms_xla)(fs)
    nb = jnp.broadcast_to(norms_b[:, :, None], (b, n_pad, TILE))
    ns = jnp.broadcast_to(norms_s[:, :, None], (b, n_pad, TILE))

    kernel = functools.partial(
        _mf_kernel, n_tiles=n_tiles, n_iters=n_iters, wb=float(w_b), ws=float(w_s)
    )

    def bspec(cols):
        return pl.BlockSpec((1, n_pad, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[bspec(m_pad), bspec(8), bspec(8), bspec(TILE), bspec(TILE)],
        out_specs=bspec(m_pad),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_pad, m_pad), jnp.float32),
            pltpu.VMEM((n_pad, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(un, fb, fs, nb, ns)
    return out[:, :n, :m]
