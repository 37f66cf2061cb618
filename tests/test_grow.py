import numpy as np
import pytest

from dsrg_tpu.ops.grow import dsrg_grow
from tests.oracles.grow_oracle import grow_oracle


def _random_grow_case(rng, m=8, h=15, w=17, n_present=4, cue_frac=0.04):
    labels = np.zeros(m, np.float32)
    labels[0] = 1.0
    fg = rng.choice(np.arange(1, m), size=n_present - 1, replace=False)
    labels[fg] = 1.0
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 3.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    cues = (rng.uniform(size=(h, w, m)) < cue_frac).astype(np.float32)
    # cues only exist for present classes in the reference pickle
    cues *= labels[None, None, :]
    return labels, cues, probs


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_grow_matches_union_find_oracle(seed):
    rng = np.random.default_rng(seed)
    labels, cues, probs = _random_grow_case(rng)
    ours = np.asarray(
        dsrg_grow(labels[None], cues[None], probs[None], th1=0.99, th2=0.85)
    )[0]
    ref = grow_oracle(labels, cues.transpose(2, 0, 1), probs.transpose(2, 0, 1))
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)


def test_grow_aggressive_thresholds_and_dense_cues():
    # low thresholds -> most pixels are candidates: stresses flood-fill depth
    rng = np.random.default_rng(10)
    labels, cues, probs = _random_grow_case(rng, m=6, h=21, w=21, cue_frac=0.15)
    ours = np.asarray(
        dsrg_grow(labels[None], cues[None], probs[None], th1=0.3, th2=0.1)
    )[0]
    ref = grow_oracle(
        labels, cues.transpose(2, 0, 1), probs.transpose(2, 0, 1), th1=0.3, th2=0.1
    )
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)


def test_grow_no_cues_is_identity():
    rng = np.random.default_rng(11)
    labels, cues, probs = _random_grow_case(rng)
    cues[:] = 0.0
    ours = np.asarray(dsrg_grow(labels[None], cues[None], probs[None]))[0]
    np.testing.assert_array_equal(ours, cues)


def test_grow_batched_equals_per_image():
    rng = np.random.default_rng(12)
    cases = [_random_grow_case(rng) for _ in range(3)]
    labels = np.stack([c[0] for c in cases])
    cues = np.stack([c[1] for c in cases])
    probs = np.stack([c[2] for c in cases])
    batched = np.asarray(dsrg_grow(labels, cues, probs))
    for i in range(3):
        single = np.asarray(dsrg_grow(labels[i : i + 1], cues[i : i + 1], probs[i : i + 1]))[0]
        np.testing.assert_array_equal(batched[i], single)


def test_grow_is_superset_of_cues_on_present_classes():
    rng = np.random.default_rng(13)
    labels, cues, probs = _random_grow_case(rng)
    ours = np.asarray(dsrg_grow(labels[None], cues[None], probs[None]))[0]
    assert np.all(ours >= cues)


def test_grow_inverted_thresholds_th1_below_th2():
    """th1 < th2: the reference's nested ifs (pylayers.py:251-257) require a
    background pixel to clear BOTH thresholds; with th1=0.2 < th2=0.6 a pixel
    with bg confidence in (0.2, 0.6] must NOT become a background candidate.
    Regression for the dropped th2 conjunct (ADVICE r1)."""
    rng = np.random.default_rng(30)
    labels, cues, probs = _random_grow_case(rng, m=6, h=21, w=21, cue_frac=0.08)
    ours = np.asarray(
        dsrg_grow(labels[None], cues[None], probs[None], th1=0.2, th2=0.6)
    )[0]
    ref = grow_oracle(
        labels, cues.transpose(2, 0, 1), probs.transpose(2, 0, 1), th1=0.2, th2=0.6
    )
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_grow_with_overlapping_multiclass_cues(seed):
    """Stresses the barrier rule's branches: pixels cued by exactly one OTHER
    class (barrier), by two classes (convertible), and by the growing class."""
    rng = np.random.default_rng(seed)
    m, h, w = 6, 19, 19
    labels = np.zeros(m, np.float32)
    labels[[0, 1, 2, 3]] = 1.0
    logits = rng.normal(size=(h, w, m)).astype(np.float32) * 4
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    # dense, heavily overlapping cues across present classes
    cues = (rng.uniform(size=(h, w, m)) < 0.25).astype(np.float32)
    cues *= labels[None, None, :]
    assert (cues.sum(-1) >= 2).any()  # overlaps exercised
    ours = np.asarray(
        dsrg_grow(labels[None], cues[None], probs[None], th1=0.5, th2=0.2)
    )[0]
    ref = grow_oracle(
        labels, cues.transpose(2, 0, 1), probs.transpose(2, 0, 1), th1=0.5, th2=0.2
    )
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)
