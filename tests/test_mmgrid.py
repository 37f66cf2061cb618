"""Matmul-bilateral-grid CRF engine vs the exact engine and the native CPU
permutohedral engine (reference parity surface: ``CRF/src/permutohedral.cpp``
splat/blur/slice + ``densecrf.cpp:115-131`` mean field)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dsrg_tpu import native
from dsrg_tpu.ops.crf import CRF
from dsrg_tpu.ops.crf.mmgrid import mean_field_mmgrid


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        assert native.build(), "native toolchain build failed"


def _confident_case(rng, h=64, w=64, m=8):
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = (40, 90, 200)
    image[:, w // 2 :] = (210, 160, 30)
    image[20:40, 20:44] = (90, 200, 60)
    image += rng.normal(size=image.shape).astype(np.float32) * 8
    image = image.clip(0, 255)
    labels = np.broadcast_to(
        np.where(np.arange(w)[None, :] < w // 2, 1, 3), (h, w)
    ).copy()
    labels[20:40, 20:44] = 5
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 0.3
    logits[np.arange(h)[:, None], np.arange(w)[None, :], labels] += 2.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return image, e / e.sum(-1, keepdims=True)


@pytest.mark.parametrize("sf", [1.0, 5.0])
def test_mmgrid_matches_exact_confident(sf):
    rng = np.random.default_rng(3)
    image, probs = _confident_case(rng)
    q_mm = np.asarray(
        mean_field_mmgrid(jnp.asarray(probs), jnp.asarray(image), 10, scale_factor=sf)
    )
    q_ex = native.crf_cpu(image, probs, maxiter=10, scale_factor=sf)
    agree = (q_mm.argmax(-1) == q_ex.argmax(-1)).mean()
    assert agree == 1.0, agree
    assert np.abs(q_mm - q_ex).mean() < 1e-4


def test_mmgrid_matches_exact_noise_unaries_short_horizon():
    """sf=5 puts sigma_xy=16 << image size: the half-cell spatial
    quantization is fully exercised.  Flat-noise unaries after MANY
    iterations are a basin-selection lottery (mean field amplifies any
    kernel difference into different converged regions — the spatial_exact
    path and the compact lattice diverge from exact identically there), so
    filter fidelity is judged on the 2-iteration marginals, where the
    trajectory is still determined by the kernel itself."""
    rng = np.random.default_rng(4)
    image, _ = _confident_case(rng)
    m = 8
    probs = rng.dirichlet(np.ones(m), size=(64, 64)).astype(np.float32)
    q_mm = np.asarray(
        mean_field_mmgrid(jnp.asarray(probs), jnp.asarray(image), 2, scale_factor=5.0)
    )
    q_ex = native.crf_cpu(image, probs, maxiter=2, scale_factor=5.0)
    agree = (q_mm.argmax(-1) == q_ex.argmax(-1)).mean()
    assert agree > 0.99, agree
    assert np.abs(q_mm - q_ex).max() < 0.02


def test_mmgrid_spatial_exact_path():
    rng = np.random.default_rng(5)
    image, probs = _confident_case(rng)
    q_f = np.asarray(
        mean_field_mmgrid(jnp.asarray(probs), jnp.asarray(image), 10, scale_factor=5.0)
    )
    q_e = np.asarray(
        mean_field_mmgrid(
            jnp.asarray(probs), jnp.asarray(image), 10, scale_factor=5.0,
            spatial_exact=True,
        )
    )
    assert (q_f.argmax(-1) == q_e.argmax(-1)).mean() > 0.999


def test_mmgrid_exact_pallas_matches_xla():
    """The fused-kernel 4-corner path (corner spatial weights folded into
    the r-weight operand) must agree with the XLA 4-corner path — the only
    difference is bf16 rounding of the folded weights."""
    rng = np.random.default_rng(11)
    image, probs = _confident_case(rng)
    mk = lambda pallas: np.asarray(
        mean_field_mmgrid(
            jnp.asarray(probs), jnp.asarray(image), 3, scale_factor=5.0,
            spatial_exact=True, use_pallas=pallas,
        )
    )
    q_p, q_x = mk(True), mk(False)
    assert (q_p.argmax(-1) == q_x.argmax(-1)).mean() == 1.0
    assert np.abs(q_p - q_x).max() < 5e-3


def test_mmgrid_masked_canvas_is_exact_for_valid_region():
    """Batched-inference contract: a padded canvas with valid_mask must match
    the unpadded run on the valid region."""
    rng = np.random.default_rng(6)
    image, probs = _confident_case(rng)
    h = w = 64
    hp = wp = 96
    img_p = np.zeros((hp, wp, 3), np.float32)
    img_p[:h, :w] = image
    un_p = np.full((hp, wp, probs.shape[-1]), -20.0, np.float32)
    un_p[:h, :w] = np.log(probs)
    mask = np.zeros((hp, wp), np.float32)
    mask[:h, :w] = 1.0
    q_pad = np.asarray(
        mean_field_mmgrid(
            jnp.asarray(un_p), jnp.asarray(img_p), 10, scale_factor=5.0,
            valid_mask=jnp.asarray(mask),
        )
    )[:h, :w]
    q_ref = np.asarray(
        mean_field_mmgrid(
            jnp.asarray(np.log(probs)), jnp.asarray(image), 10, scale_factor=5.0
        )
    )
    assert (q_pad.argmax(-1) == q_ref.argmax(-1)).mean() == 1.0
    assert np.abs(q_pad - q_ref).max() < 1e-4


def test_crf_api_mmgrid_engine_dispatch():
    rng = np.random.default_rng(7)
    image, probs = _confident_case(rng, h=96, w=96)  # 9216 px > EXACT_MAX_PIXELS
    q_auto = np.asarray(CRF(image, np.log(probs), maxiter=5))  # auto -> mmgrid
    q_mm = np.asarray(CRF(image, np.log(probs), maxiter=5, engine="mmgrid"))
    np.testing.assert_allclose(q_auto, q_mm, atol=1e-6)
    q_ex = np.asarray(CRF(image, np.log(probs), maxiter=5, engine="exact"))
    assert (q_mm.argmax(-1) == q_ex.argmax(-1)).mean() > 0.999
