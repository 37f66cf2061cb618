"""Independent numpy brute-force dense-CRF oracle.

Implements the mean-field update of Krahenbuhl & Koltun (NIPS 2011) with
symmetric kernel normalization exactly as the reference engine specifies it
(``CRF/src/densecrf.cpp:115-131``, ``CRF/src/pairwise.cpp:40-62``,
``CRF/krahenbuhl2013/CRF.py:25-35``) — written from the equations, not from
the C++ (no lattice: the kernel matrix is materialized exactly).
"""

import numpy as np


def gaussian_kernel(feats):
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * d2)


def mean_field_np(unary, feats_list, weights, n_iters=10):
    """unary: (N, M) scores (negated costs). Returns (N, M) marginals."""
    kernels = [gaussian_kernel(np.asarray(f, np.float64)) for f in feats_list]
    norms = [1.0 / np.sqrt(k @ np.ones(k.shape[0]) + 1e-20) for k in kernels]

    def softmax(x):
        z = x - x.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    q = softmax(unary)
    for _ in range(n_iters):
        msg = np.zeros_like(q)
        for k, nrm, w in zip(kernels, norms, weights):
            msg += w * (nrm[:, None] * (k @ (nrm[:, None] * q)))
        q = softmax(unary + msg)
    return q


def crf_np(image, unary, maxiter=10, scale_factor=1.0, color_factor=13.0):
    """Reference ``CRF()`` parameterization (CRF.py:31-32) on (H, W, *) arrays."""
    h, w, m = unary.shape
    img = np.round(np.asarray(image, np.float64))
    ys, xs = np.mgrid[0:h, 0:w]
    spat = np.stack(
        [xs / (3.0 / scale_factor), ys / (3.0 / scale_factor)], -1
    ).reshape(h * w, 2)
    bila = np.concatenate(
        [
            np.stack([xs / (80.0 / scale_factor), ys / (80.0 / scale_factor)], -1),
            img / color_factor,
        ],
        axis=-1,
    ).reshape(h * w, 5)
    q = mean_field_np(unary.reshape(h * w, m), [bila, spat], [10.0, 3.0], maxiter)
    return q.reshape(h, w, m)
