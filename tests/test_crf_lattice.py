"""Compact-lattice CRF engine vs the exact engine (same methodology as the
dense-grid test — both approximate the permutohedral-style truncation)."""

import numpy as np
import jax.numpy as jnp

from dsrg_tpu.ops.crf.exact import mean_field_exact
from dsrg_tpu.ops.crf.features import bilateral_features, spatial_features
from dsrg_tpu.ops.crf.lattice import CompactLatticePlan, mean_field_lattice
from tests.test_crf_grid import _case


def test_lattice_filter_mass_consistency():
    rng = np.random.default_rng(0)
    image, _ = _case(rng, 24, 24, 4)
    plan = CompactLatticePlan(jnp.asarray(image), 80.0, 13.0)
    ones = np.asarray(plan.filter(jnp.ones((24, 24, 1))))
    assert np.all(ones > 0)  # every pixel sees some kernel mass


def test_lattice_engine_agrees_with_exact_argmax():
    rng = np.random.default_rng(1)
    h = w = 48
    image, probs = _case(rng, h, w, 6)
    exact = np.asarray(
        mean_field_exact(
            jnp.asarray(np.log(probs).reshape(h * w, 6)),
            (
                bilateral_features(jnp.asarray(image), 80.0, 80.0, 13.0, 13.0, 13.0),
                spatial_features(h, w, 3.0, 3.0),
            ),
            (10.0, 3.0),
            n_iters=5,
        )
    ).reshape(h, w, 6)
    lat = np.asarray(
        mean_field_lattice(jnp.asarray(np.log(probs)), jnp.asarray(image), n_iters=5)
    )
    agree = (exact.argmax(-1) == lat.argmax(-1)).mean()
    assert agree > 0.95, agree
    np.testing.assert_allclose(lat.sum(-1), 1.0, atol=1e-5)
