"""Pallas fused mean-field kernel vs the exact XLA engine (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from dsrg_tpu.ops.crf.exact import mean_field_exact
from dsrg_tpu.ops.crf.features import bilateral_features, spatial_features
from dsrg_tpu.ops.crf.pallas_mf import mean_field_pallas


def test_pallas_mean_field_matches_exact_engine():
    rng = np.random.default_rng(0)
    b, h, w, m = 2, 12, 11, 5
    n = h * w
    unary = rng.normal(size=(b, n, m)).astype(np.float32)
    fb, fs = [], []
    for i in range(b):
        img = jnp.asarray(rng.integers(0, 256, size=(h, w, 3)).astype(np.float32))
        fb.append(bilateral_features(img, 80 / 12, 80 / 12, 13, 13, 13))
        fs.append(spatial_features(h, w, 0.25, 0.25))
    fb = jnp.stack(fb)
    fs = jnp.stack(fs)

    got = np.asarray(
        mean_field_pallas(jnp.asarray(unary), fb, fs, n_iters=5, interpret=True)
    )
    for i in range(b):
        ref = np.asarray(
            mean_field_exact(jnp.asarray(unary[i]), (fb[i], fs[i]), (10.0, 3.0), n_iters=5)
        )
        assert np.abs(got[i] - ref).max() < 2e-2
        agree = (got[i].argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.99, agree
        np.testing.assert_allclose(got[i].sum(-1), 1.0, atol=1e-4)
