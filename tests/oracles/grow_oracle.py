"""Numpy oracle for DSRG seed growing, written as set algebra over
``scipy.ndimage.label`` components.

Pins the *semantics* of the reference's per-image grow worker
(``pylayers/pylayers/pylayers.py:237-275``) — candidate thresholding,
8-connected components, seed-containing-component expansion, the
exclusively-seeded-elsewhere barrier rule, and the sequential per-class
mutation order — in an independent formulation: a vectorized ownership map
plus per-component membership tests, rather than the reference's
pixel-enumeration loops and union-find CC labeling.  Cross-checked against
the framework's flood-fill kernel by the fuzz tests in ``test_grow.py``.
"""

import numpy as np
from scipy import ndimage

EIGHT_CONN = np.ones((3, 3), dtype=int)


def grow_oracle(image_labels, cues, probs_refined, th1=0.99, th2=0.85):
    """image_labels: (M,) multi-hot; cues/probs_refined: (M, h, w). Returns (M, h, w).

    Semantics being pinned (reference behaviors, not implementation):
      1. Only classes present in the image compete; each pixel's candidate is
         the confidence-argmax over those classes.
      2. A pixel is *claimed* by its candidate class when confidence > th2
         (foreground) or > max(th1, th2) (background, class 0); claims
         overwrite cue-derived ownership.  Unclaimed cue pixels are owned by
         their highest cue class.
      3. Per present class, ascending: 8-connected components of the class's
         owned region that contain one of its original cue pixels expand into
         new seeds — except *barrier* pixels, which are exclusively seeded
         (exactly one seed channel set, not this class) in the seed array as
         mutated by earlier classes this call (sequential class order).
    """
    grown = np.array(cues, dtype=np.float32, copy=True)
    num_classes, height, width = grown.shape
    present = np.flatnonzero(np.asarray(image_labels) == 1)

    confidences = np.asarray(probs_refined)[present]  # (P, h, w)
    winner = present[np.argmax(confidences, axis=0)]  # (h, w) class ids
    confidence = confidences.max(axis=0)

    # ownership map: cue pixels belong to their highest cue class...
    owner = np.full((height, width), -1, dtype=np.int64)
    for c in range(num_classes):  # ascending: the last writer wins
        owner[np.asarray(cues)[c] > 0] = c
    # ...then confident winners claim pixels outright
    claimed_fg = (confidence > th2) & (winner != 0)
    claimed_bg = (confidence > th2) & (confidence > th1) & (winner == 0)
    claimed = claimed_fg | claimed_bg
    owner[claimed] = winner[claimed]

    for c in present:
        region = owner == c
        components, _ = ndimage.label(region, structure=EIGHT_CONN)
        original_cue = np.asarray(cues)[c] == 1
        seeded_ids = np.unique(components[region & original_cue])
        seeded_ids = seeded_ids[seeded_ids != 0]
        if seeded_ids.size == 0:
            continue
        # barrier: exclusively seeded by some other channel at this point in
        # the (sequential, ascending-class) mutation of `grown`
        barrier = region & ~original_cue & (grown.sum(axis=0) == 1)
        expand = np.isin(components, seeded_ids) & ~barrier
        grown[c][expand] = 1
    return grown
