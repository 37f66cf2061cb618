"""Exact dense-kernel mean-field inference for fully-connected CRFs.

The reference engine (``CRF/src/densecrf.cpp:115-131``) runs, per mean-field
iteration,

    Q <- expAndNormalize( -unary_cost - sum_k compat_k( filter_k(Q) ) )

where ``filter_k`` is a symmetric-normalized Gaussian filter over a feature
space, approximated there with a permutohedral lattice
(``CRF/src/permutohedral.cpp``) and normalized per ``CRF/src/pairwise.cpp:40-62``:

    norm = 1 / sqrt(K @ 1 + 1e-20);   filter(Q) = norm * (K @ (norm * Q))

A lattice is a CPU-pointer-chasing structure that maps terribly to TPUs.  At
DSRG's training resolution (41x41 => N = 1681 pixels) the *exact* kernel
matrix is small (N^2 ~ 2.8M entries), so instead of translating the lattice we
materialize ``K = exp(-||f_i - f_j||^2 / 2)`` once per call and run the
mean-field loop as plain matmuls on the MXU.  This is both exact (the lattice
itself only approximates this K) and, batched over images with ``vmap``,
replaces the reference's serial per-image host loop
(``pylayers/pylayers/pylayers.py:81-82,325-326``).

For large images (inference-time CRF at full resolution) see
``dsrg_tpu.ops.crf.grid`` which approximates the same filter with a dense
bilateral grid.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def gaussian_kernel_matrix(feats: jnp.ndarray, precision=_HIGH) -> jnp.ndarray:
    """K[i, j] = exp(-||f_i - f_j||^2 / 2) for (N, d) features (incl. diagonal).

    Like the reference lattice filter, K includes the self term (the engine
    never subtracts the pixel's own contribution).
    """
    sq = jnp.sum(feats * feats, axis=-1)
    cross = jnp.dot(feats, feats.T, precision=precision, preferred_element_type=jnp.float32)
    d2 = sq[:, None] + sq[None, :] - 2.0 * cross
    return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def symmetric_norm(k: jnp.ndarray, precision=_HIGH) -> jnp.ndarray:
    """NORMALIZE_SYMMETRIC weights: 1/sqrt(K @ 1 + 1e-20) (pairwise.cpp:54-57)."""
    ones = jnp.ones((k.shape[-1],), dtype=k.dtype)
    deg = jnp.dot(k, ones, precision=precision, preferred_element_type=jnp.float32)
    return jax.lax.rsqrt(deg + 1e-20)


def kernel_norm_weights(k: jnp.ndarray, ntype: str, precision=_HIGH):
    """(pre, post) per-pixel weights for the forward filter, per the
    reference ``DenseKernel`` normalization modes (pairwise.cpp:40-80,
    transpose=false path):

      - ``"no"``: raw K @ q (NO_NORMALIZATION applies no weights in filter());
      - ``"before"``: K @ (q / deg);
      - ``"after"``: (K @ q) / deg  (the NIPS'11 normalization);
      - ``"symmetric"``: rsqrt(deg) both sides (ICML'13; the default and the
        only mode DSRG exercises), with deg = K @ 1 (+1e-20).
    Returns None for an unused side."""
    ones = jnp.ones((k.shape[-1],), dtype=k.dtype)
    deg = jnp.dot(k, ones, precision=precision, preferred_element_type=jnp.float32)
    if ntype == "symmetric":
        nrm = jax.lax.rsqrt(deg + 1e-20)
        return nrm, nrm
    if ntype == "before":
        return 1.0 / (deg + 1e-20), None
    if ntype == "after":
        return None, 1.0 / (deg + 1e-20)
    if ntype == "no":
        return None, None
    raise ValueError(f"unknown normalization type: {ntype!r}")


def normalized_filter(k, q, pre, post, precision=_HIGH):
    """post * (K @ (pre * q)) with either side optional."""
    x = q if pre is None else pre[:, None] * q
    out = jnp.dot(k, x, precision=precision, preferred_element_type=jnp.float32)
    return out if post is None else post[:, None] * out


def _softmax_cols(x: jnp.ndarray) -> jnp.ndarray:
    """expAndNormalize over the class axis (densecrf.cpp:98-106); x is (N, M)."""
    z = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(z)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def mean_field_exact(
    unary: jnp.ndarray,
    feats_list: Sequence[jnp.ndarray],
    weights: Sequence[float] | jnp.ndarray,
    n_iters: int = 10,
    precision=_HIGH,
    fast: bool = False,
) -> jnp.ndarray:
    """Run exact mean-field inference for Potts-compatibility kernels.

    Args:
      unary: (N, M) *negated* unary costs — i.e. exactly what callers hand the
        reference ``CRF()`` wrapper (``CRF/krahenbuhl2013/CRF.py:28`` negates
        before storing costs, and the update negates again).
      feats_list: one (N, d_k) feature array per pairwise kernel.
      weights: Potts weight w_k per kernel (PottsCompatibility: out = -w * Q,
        ``labelcompatibility.cpp:45-47``; the inference loop then subtracts,
        so the message enters with +w).
      n_iters: mean-field iterations (reference default 10).

    Returns:
      (N, M) marginals Q.

    ``fast=True`` stores the kernel matrices in bfloat16 and runs the message
    matmuls at default MXU precision with fp32 accumulation — ~4-8x faster on
    TPU.  The kernel entries are smooth Gaussians in [0, 1] and mean field is
    a contraction toward a softmax fixed point, so the bf16 quantization
    perturbs marginals at the ~1e-3 level (validated against the exact path
    in tests/test_crf_fast.py — grown seeds are unchanged).
    """
    kdtype = jnp.bfloat16 if fast else jnp.float32
    mm_precision = jax.lax.Precision.DEFAULT if fast else precision
    kernels = [
        gaussian_kernel_matrix(f.astype(jnp.float32), precision).astype(kdtype)
        for f in feats_list
    ]
    norms = [symmetric_norm(k.astype(jnp.float32), precision) for k in kernels]

    def message(q):
        msg = jnp.zeros_like(q)
        for k, nrm, w in zip(kernels, norms, list(weights)):
            filt = nrm[:, None] * jnp.dot(
                k, (nrm[:, None] * q).astype(kdtype),
                precision=mm_precision, preferred_element_type=jnp.float32,
            )
            msg = msg + w * filt
        return msg

    q0 = _softmax_cols(unary)

    def body(_, q):
        return _softmax_cols(unary + message(q))

    # n_iters is static (reference: 10) and the state is one (N, M) array:
    # fully unrolling removes the while-loop's per-iteration dispatch
    # barriers and lets XLA schedule/fuse across iterations (the train
    # step's CRF showed ~1.8 ms/step of bare `while` overhead in
    # artifacts/step_profile_r05.json).
    return jax.lax.fori_loop(0, n_iters, body, q0, unroll=True)


def mean_field_general(
    unary: jnp.ndarray,
    feats_list: Sequence[jnp.ndarray],
    compat_fns: Sequence,
    n_iters: int = 10,
    precision=_HIGH,
    norm_types: Sequence[str] | None = None,
) -> jnp.ndarray:
    """Mean field with arbitrary label-compatibility transforms.

    ``compat_fns[k]`` maps the filtered (N, M) messages to the compatibility
    output (e.g. Potts: ``lambda m: -w * m``; Diagonal: ``m * v``; Matrix:
    ``m @ W.T`` — signs per ``CRF/src/labelcompatibility.cpp:45-85``).  The
    update subtracts the compatibility output, matching
    ``densecrf.cpp:122-129``.  ``norm_types[k]`` picks the per-kernel filter
    normalization (``kernel_norm_weights``); default symmetric everywhere.
    """
    kernels = [gaussian_kernel_matrix(f.astype(jnp.float32), precision) for f in feats_list]
    if norm_types is None:
        norm_types = ["symmetric"] * len(kernels)
    norms = [kernel_norm_weights(k, nt, precision) for k, nt in zip(kernels, norm_types)]

    q = _softmax_cols(unary)
    for _ in range(n_iters):
        tmp = unary
        for k, (pre, post), compat in zip(kernels, norms, compat_fns):
            tmp = tmp - compat(normalized_filter(k, q, pre, post, precision))
        q = _softmax_cols(tmp)
    return q
