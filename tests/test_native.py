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
