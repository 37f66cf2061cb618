"""Build the native C++ engines and validate against the Python oracles."""

import numpy as np
import pytest

from dsrg_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        assert native.build(), "native toolchain build failed"


def test_native_crf_matches_oracle():
    from tests.oracles.crf_oracle import crf_np

    rng = np.random.default_rng(0)
    h, w, m = 9, 11, 5
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    logits = rng.normal(size=(h, w, m)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    got = native.crf_cpu(image, probs, maxiter=10, scale_factor=12.0)
    ref = crf_np(image, probs, maxiter=10, scale_factor=12.0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_permutohedral_filter_approximates_gaussian():
    """Normalized lattice filter vs brute-force Gaussian on clustered data.

    The permutohedral lattice is an approximation; on well-sampled features
    (two tight clusters — the regime CRF guide images live in) the normalized
    filter (ratio of filters, the form mean field consumes under symmetric
    normalization) must track the exact Gaussian closely."""
    rng = np.random.default_rng(2)
    n, d, c = 400, 5, 3
    centers = np.array([[0.0] * d, [6.0] * d], np.float32)
    feats = (
        centers[rng.integers(0, 2, size=n)] + rng.normal(size=(n, d)) * 0.3
    ).astype(np.float32)
    vals = rng.normal(size=(n, c)).astype(np.float32)

    got = native.permutohedral_filter(feats, vals)
    got_n = got / native.permutohedral_filter(feats, np.ones((n, 1), np.float32))

    diff = feats[:, None, :] - feats[None, :, :]
    K = np.exp(-0.5 * (diff**2).sum(-1))
    ref_n = (K @ vals) / (K @ np.ones((n, 1)))

    err = np.abs(got_n - ref_n).max()
    assert err < 0.08, err


def test_permutohedral_crf_agrees_with_exact_on_confident_input():
    """CRF marginals: permutohedral vs exact-N^2 native engine.

    Peaked unaries on piecewise-constant regions (photo-like statistics) —
    where the argmax is meaningful — must agree almost everywhere; the two
    engines may diverge only on near-uniform (tied) pixels."""
    rng = np.random.default_rng(3)
    h = w = 41
    m = 8
    # two-region guide image + matching peaked unaries, plus noise
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = (40, 90, 200)
    image[:, w // 2 :] = (210, 160, 30)
    image += rng.normal(size=image.shape).astype(np.float32) * 8
    image = image.clip(0, 255)
    labels = np.where(np.arange(w)[None, :] < w // 2, 1, 3)
    labels = np.broadcast_to(labels, (h, w))
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 0.3
    logits[np.arange(h)[:, None], np.arange(w)[None, :], labels] += 2.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    q_perm = native.crf_permutohedral(image, probs, maxiter=10, scale_factor=1.0)
    q_exact = native.crf_cpu(image, probs, maxiter=10, scale_factor=1.0)
    agree = (q_perm.argmax(-1) == q_exact.argmax(-1)).mean()
    assert agree > 0.995, agree


def test_native_grow_matches_oracle():
    from tests.oracles.grow_oracle import grow_oracle

    rng = np.random.default_rng(1)
    m, h, w = 8, 15, 17
    labels = np.zeros(m, np.float32)
    labels[[0, 2, 5]] = 1.0
    logits = rng.normal(size=(m, h, w)).astype(np.float32) * 3
    e = np.exp(logits - logits.max(0, keepdims=True))
    probs = e / e.sum(0, keepdims=True)
    cues = (rng.uniform(size=(m, h, w)) < 0.05).astype(np.float32) * labels[:, None, None]

    got = native.region_grow_cpu(labels, cues, probs, 0.6, 0.3)
    ref = grow_oracle(labels, cues, probs, 0.6, 0.3)
    np.testing.assert_array_equal(got, ref)
