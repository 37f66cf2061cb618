"""Multi-scale inference math vs a hand numpy reference (test-ms.py recipe)."""

import numpy as np
from scipy.ndimage import zoom as ndzoom

import jax
import jax.numpy as jnp

from dsrg_tpu.inference import EPS, Predictor
from dsrg_tpu.models import DeepLabLargeFOV


def _predictor(num_classes=5):
    model = DeepLabLargeFOV(num_classes=num_classes, head_dilations=(2, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    return Predictor(model, params, num_classes=num_classes, bucket=1), model, params


def test_multiscale_probs_match_manual_pipeline():
    predictor, model, params = _predictor()
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (45, 53, 3)).astype(np.uint8)

    sizes = [33, 41]
    got = predictor.predict_probs(image, sizes=sizes)

    mean = np.array([104.0, 117.0, 123.0], np.float32)
    d1, d2 = 45.0, 53.0
    scores_all = 0.0
    for s in sizes:
        bgr = image[:, :, ::-1].astype(np.float32)
        scaled = ndzoom(bgr, (s / d1, s / d2, 1.0), order=1) - mean
        sc = np.asarray(
            model.apply({"params": params}, jnp.asarray(scaled[None]), train=False)
        )[0]
        sc = ndzoom(sc, (d1 / sc.shape[0], d2 / sc.shape[1], 1.0), order=1)
        scores_all = scores_all + sc
    e = np.exp(scores_all - scores_all.max(-1, keepdims=True))
    ref = np.maximum(e / e.sum(-1, keepdims=True), EPS)

    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_bucketed_padding_shapes_and_determinism():
    """bucket>1 pads to a shape bucket and crops scores back: output geometry
    must match the exact path exactly, and repeated runs must be identical.
    (Numeric equivalence to bucket=1 is by construction approximate — the
    LargeFOV receptive field sees mean-pixel context beyond the true border
    instead of conv zero padding — so only parity-critical runs use
    bucket=1; see Predictor docstring.)"""
    predictor_b, model, params = _predictor()
    predictor_b.bucket = 64
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (45, 53, 3)).astype(np.uint8)
    p1 = predictor_b.predict_probs(image, sizes=[41])
    p2 = predictor_b.predict_probs(image, sizes=[41])
    assert p1.shape == (45, 53, 5)
    np.testing.assert_array_equal(p1, p2)


def test_restrict_labels_masking():
    predictor, _, _ = _predictor()
    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, (41, 41, 3)).astype(np.uint8)
    mask = predictor.predict_mask(
        image, sizes=[41], smooth=False, restrict_labels=np.array([0, 3])
    )
    assert set(np.unique(mask)).issubset({0, 3})
