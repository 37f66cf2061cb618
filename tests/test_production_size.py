"""Oracle parity at the production geometry (41x41, 21 classes) — the exact
shapes every stage-1 training step runs at."""

import numpy as np

from dsrg_tpu.ops.crf import crf_refine_probs
from dsrg_tpu.ops.grow import dsrg_grow
from dsrg_tpu.ops.softmax import MIN_PROB
from tests.oracles.crf_oracle import crf_np
from tests.oracles.grow_oracle import grow_oracle


def test_crf_refinement_production_geometry():
    from scipy.ndimage import zoom as ndzoom

    rng = np.random.default_rng(0)
    h = w = 41
    m = 21
    images = rng.uniform(-120, 130, size=(1, 321, 321, 3)).astype(np.float32)
    logits = rng.normal(size=(1, h, w, m)).astype(np.float32) * 2
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)

    ours = np.asarray(crf_refine_probs(probs, images, scale_factor=12.0))

    mean = np.array([104.0, 117.0, 123.0], np.float32)
    p = np.maximum(probs[0], MIN_PROB)
    im = np.round(ndzoom(images[0], (41 / 321, 41 / 321, 1.0), order=1) + mean)
    ref = crf_np(im, p, maxiter=10, scale_factor=12.0)
    ref = np.maximum(ref, MIN_PROB)
    ref = ref / ref.sum(-1, keepdims=True)

    assert np.abs(ours[0] - ref).max() < 5e-3
    agree = (ours[0].argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.999, agree


def test_grow_production_geometry():
    rng = np.random.default_rng(1)
    h = w = 41
    m = 21
    labels = np.zeros(m, np.float32)
    labels[0] = 1.0
    labels[rng.choice(np.arange(1, m), 3, replace=False)] = 1.0
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 3
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    cues = (rng.uniform(size=(h, w, m)) < 0.02).astype(np.float32) * labels[None, None, :]

    ours = np.asarray(dsrg_grow(labels[None], cues[None], probs[None]))[0]
    ref = grow_oracle(labels, cues.transpose(2, 0, 1), probs.transpose(2, 0, 1))
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)
