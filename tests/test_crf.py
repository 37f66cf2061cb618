import numpy as np
import pytest

from dsrg_tpu.ops.crf import CRF, DenseCRF, crf_refine_probs, crf_log_refine
from dsrg_tpu.ops.softmax import MIN_PROB
from tests.oracles.crf_oracle import crf_np


def _random_case(rng, h, w, m):
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    logits = rng.normal(size=(h, w, m)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return image, probs


@pytest.mark.parametrize("sf", [1.0, 12.0])
def test_crf_matches_bruteforce_oracle(sf):
    rng = np.random.default_rng(0)
    image, probs = _random_case(rng, 9, 11, 5)
    ours = np.asarray(CRF(image, probs, maxiter=10, scale_factor=sf))
    ref = crf_np(image, probs, maxiter=10, scale_factor=sf)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # marginals: rows sum to one
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)


def test_crf_log_unary_path():
    # test tools pass log-probabilities (test-ms.py:106); semantics identical
    rng = np.random.default_rng(1)
    image, probs = _random_case(rng, 8, 8, 4)
    ours = np.asarray(CRF(image, np.log(probs), maxiter=5, scale_factor=1.0))
    ref = crf_np(image, np.log(probs), maxiter=5, scale_factor=1.0)
    # fp32 engine vs fp64 oracle over 5 sharpening iterations
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-4)


def test_dense_crf_object_api():
    rng = np.random.default_rng(2)
    h, w, m = 7, 6, 4
    image, probs = _random_case(rng, h, w, m)
    crf = DenseCRF(w, h, m)
    assert crf.npixels() == h * w and crf.nlabels() == m
    crf.set_unary_energy(-probs.ravel().astype(np.float32))
    crf.add_pairwise_energy(
        10.0, 80.0, 80.0, 13.0, 13.0, 13.0, 3.0, 3.0, 3.0,
        np.round(image).astype(np.uint8).ravel(),
    )
    flat = crf.inference(10)
    assert flat.shape == (h * w * m,)
    ref = crf_np(image, probs, maxiter=10, scale_factor=1.0)
    np.testing.assert_allclose(flat.reshape(h, w, m), ref, rtol=1e-4, atol=1e-5)
    labels = crf.map(10)
    assert labels.shape == (h * w,)
    np.testing.assert_array_equal(labels, ref.reshape(-1, m).argmax(-1))


def test_crf_refine_probs_batched_matches_per_image_reference_recipe():
    """crf_refine_probs == the CRFLayer forward recipe (clamp, zoom, CRF, renorm)."""
    from scipy.ndimage import zoom as ndzoom

    rng = np.random.default_rng(3)
    b, hh, ww, m = 2, 33, 33, 6
    h = w = 5
    images_full = rng.uniform(0, 255, size=(b, hh, ww, 3)).astype(np.float32)
    mean = np.array([104.0, 117.0, 123.0], np.float32)
    images_ms = images_full - mean  # mean-subtracted, as fed to the net
    logits = rng.normal(size=(b, h, w, m)).astype(np.float32)
    e = np.exp(logits)
    probs = e / e.sum(-1, keepdims=True)

    ours = np.asarray(crf_refine_probs(probs, images_ms, scale_factor=12.0))

    for i in range(b):
        p = np.maximum(probs[i], MIN_PROB)
        im = ndzoom(images_ms[i], (h / hh, w / ww, 1.0), order=1)
        im = np.round(im + mean)
        ref = crf_np(im, p, maxiter=10, scale_factor=12.0)
        ref = np.maximum(ref, MIN_PROB)
        ref = ref / ref.sum(-1, keepdims=True)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-5)


def test_crf_log_refine_custom_backward():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    b, h, w, m = 1, 4, 4, 3
    images = rng.uniform(-100, 100, size=(b, 8 * h + 1, 8 * w + 1, 3)).astype(np.float32)
    logits = rng.normal(size=(b, h, w, m)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)

    def f(p):
        return jnp.sum(crf_log_refine(p, jnp.asarray(images)) * 2.0)

    g = jax.grad(f)(probs)
    q = np.asarray(crf_refine_probs(probs, jnp.asarray(images)))
    # reference heuristic backward: (1 - Q) * top_diff  (pylayers.py:90-92)
    np.testing.assert_allclose(np.asarray(g), (1.0 - q) * 2.0, rtol=1e-5, atol=1e-6)


def test_crf_native_engine_matches_exact():
    from dsrg_tpu import native

    if not (native.available() or native.build()):
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    image, probs = _random_case(rng, 9, 10, 5)
    got = CRF(image, probs, maxiter=5, scale_factor=12.0, engine="native")
    ref = np.asarray(CRF(image, probs, maxiter=5, scale_factor=12.0, engine="exact"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_truegrad_refine_matches_numeric_gradient():
    """crf_refine_with_log_truegrad backprops the TRUE mean-field Jacobian
    (CRF-as-RNN opt-in): autodiff through the full refinement == central
    differences; the heuristic path differs (it is (1-Q)*g by design)."""
    import jax
    import jax.numpy as jnp

    from dsrg_tpu.ops.crf import crf_refine_with_log, crf_refine_with_log_truegrad

    rng = np.random.default_rng(11)
    b, h, w, m = 1, 6, 5, 3
    probs = rng.dirichlet(np.ones(m), size=(b, h, w)).astype(np.float32)
    images = rng.normal(size=(b, h * 8 - 7, w * 8 - 7, 3)).astype(np.float32) * 30
    cot = rng.normal(size=(b, h, w, m)).astype(np.float32)

    def loss(p):
        q_log, _ = crf_refine_with_log_truegrad(p, jnp.asarray(images), 12.0, 3)
        return jnp.sum(q_log * jnp.asarray(cot))

    g_auto = np.asarray(jax.grad(loss)(jnp.asarray(probs)), np.float64)

    eps = 1e-3
    idxs = [(0, 1, 2, 0), (0, 3, 4, 1), (0, 5, 0, 2), (0, 0, 0, 0)]
    for idx in idxs:
        pp = probs.copy(); pp[idx] += eps
        pm = probs.copy(); pm[idx] -= eps
        num = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2 * eps)
        assert abs(num - g_auto[idx]) < 5e-2 * max(1.0, abs(num)), (idx, num, g_auto[idx])

    # and the heuristic path really is different (not accidentally aliased)
    def loss_h(p):
        q_log, _ = crf_refine_with_log(p, jnp.asarray(images), 12.0, 3, False)
        return jnp.sum(q_log * jnp.asarray(cot))

    g_heur = np.asarray(jax.grad(loss_h)(jnp.asarray(probs)), np.float64)
    assert not np.allclose(g_auto, g_heur, rtol=1e-2, atol=1e-4)


def test_crf_rejects_unknown_engine():
    """A typo'd engine name must raise, not silently resolve to the
    approximate mmgrid engine (which would shift parity-run numbers)."""
    import numpy as np
    import pytest

    from dsrg_tpu.ops.crf.api import CRF

    img = np.zeros((8, 8, 3), np.float32)
    unary = np.zeros((8, 8, 4), np.float32)
    with pytest.raises(ValueError, match="unknown CRF engine"):
        CRF(img, unary, maxiter=1, engine="exactt")
