"""Validate the bf16 fast CRF path against the exact fp32 path: marginals
within ~1e-2 and — what actually matters downstream — identical grown seeds."""

import numpy as np

from dsrg_tpu.ops.crf import crf_refine_probs
from dsrg_tpu.ops.grow import dsrg_grow


def _batch(rng, b=2, hw=33, m=8):
    h = (hw - 1) // 8 + 1
    images = rng.normal(size=(b, hw, hw, 3)).astype(np.float32) * 40
    logits = rng.normal(size=(b, h, h, m)).astype(np.float32) * 3
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    labels = np.zeros((b, m), np.float32)
    labels[:, 0] = 1
    labels[:, 2] = 1
    labels[:, 5] = 1
    cues = (rng.uniform(size=(b, h, h, m)) < 0.06).astype(np.float32) * labels[:, None, None, :]
    return images, probs, labels, cues


def test_fast_crf_close_to_exact_and_seeds_identical():
    rng = np.random.default_rng(0)
    images, probs, labels, cues = _batch(rng)
    q_exact = np.asarray(crf_refine_probs(probs, images, fast=False))
    q_fast = np.asarray(crf_refine_probs(probs, images, fast=True))
    assert np.abs(q_fast - q_exact).max() < 2e-2
    # the decision-relevant property: argmax and grown seeds unchanged
    agree = (q_fast.argmax(-1) == q_exact.argmax(-1)).mean()
    assert agree > 0.995, agree
    seeds_exact = np.asarray(dsrg_grow(labels, cues, q_exact))
    seeds_fast = np.asarray(dsrg_grow(labels, cues, q_fast))
    assert (seeds_exact == seeds_fast).mean() > 0.999
