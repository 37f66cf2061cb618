"""Validate the bilateral-grid CRF engine against the exact N^2 engine."""

import numpy as np

from dsrg_tpu.ops.crf import CRF
from dsrg_tpu.ops.crf.grid import separable_gaussian_filter
from tests.oracles.crf_oracle import gaussian_kernel


def _case(rng, h, w, m):
    # piecewise-constant image with noise: realistic guide for bilateral term
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = [200, 60, 50]
    image[:, w // 2 :] = [30, 180, 190]
    image[: h // 3, :] = [120, 120, 120]
    image += rng.normal(size=image.shape) * 8
    image = np.clip(image, 0, 255)
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 2
    # make logits correlated with the image regions so the CRF has structure
    logits[:, : w // 2, 1] += 2.0
    logits[:, w // 2 :, 2] += 2.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return image, e / e.sum(-1, keepdims=True)


def test_separable_gaussian_matches_dense_kernel():
    rng = np.random.default_rng(0)
    h, w, c = 12, 10, 4
    x = rng.normal(size=(h, w, c)).astype(np.float32)
    got = np.asarray(separable_gaussian_filter(x, sigma=2.0, truncate=5.0))
    ys, xs = np.mgrid[0:h, 0:w]
    feats = np.stack([xs / 2.0, ys / 2.0], -1).reshape(h * w, 2)
    k = gaussian_kernel(feats)
    ref = (k @ x.reshape(h * w, c)).reshape(h, w, c)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_grid_engine_agrees_with_exact_argmax():
    rng = np.random.default_rng(1)
    h = w = 48  # small enough for the exact engine, large enough to be honest
    image, probs = _case(rng, h, w, 6)
    exact = np.asarray(CRF(image, np.log(probs), maxiter=5, engine="exact"))
    grid = np.asarray(CRF(image, np.log(probs), maxiter=5, engine="grid"))
    agree = (exact.argmax(-1) == grid.argmax(-1)).mean()
    assert agree > 0.97, f"argmax agreement {agree:.3f}"
    # marginals stay calibrated
    np.testing.assert_allclose(grid.sum(-1), 1.0, atol=1e-5)


def test_auto_engine_dispatch():
    rng = np.random.default_rng(2)
    image, probs = _case(rng, 8, 8, 4)
    a = np.asarray(CRF(image, probs, maxiter=2, engine="auto"))
    b = np.asarray(CRF(image, probs, maxiter=2, engine="exact"))
    np.testing.assert_array_equal(a, b)
