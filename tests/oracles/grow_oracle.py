"""Independent numpy oracle for DSRG seed growing.

Re-implements the semantics of ``generate_seed_step``
(``pylayers/pylayers/pylayers.py:237-275``) using ``scipy.ndimage.label`` for
the 8-connected components (an independent CC implementation, so this oracle
shares no code with either the reference's union-find or the framework's
flood-fill kernel).
"""

import numpy as np
from scipy import ndimage

EIGHT = np.ones((3, 3), dtype=int)


def grow_oracle(image_labels, cues, probs_refined, th1=0.99, th2=0.85):
    """image_labels: (M,) multi-hot; cues/probs_refined: (M, h, w). Returns (M, h, w)."""
    seed_c = np.array(cues, dtype=np.float32, copy=True)
    cls_index = np.where(np.asarray(image_labels) == 1)[0]
    sel = np.asarray(probs_refined)[cls_index]
    probs_c = np.argmax(sel, axis=0)
    probs_p = np.max(sel, axis=0)

    channels, height, width = seed_c.shape
    label_map = np.zeros((height, width))
    idx = np.where(seed_c > 0)
    label_map[idx[1], idx[2]] = idx[0] + 1  # ascending writes: highest class wins

    for (x, y), value in np.ndenumerate(probs_p):
        c = cls_index[probs_c[x, y]]
        if value > th2:
            if c != 0:
                label_map[x, y] = c + 1
            elif value > th1:
                label_map[x, y] = c + 1

    for c in cls_index:
        mat = (label_map == (c + 1)).astype(int)
        comp, _ = ndimage.label(mat, structure=EIGHT)
        high = set()
        barrier = np.zeros((height, width), dtype=bool)
        for (x, y), value in np.ndenumerate(mat):
            if value == 1 and seed_c[c, x, y] == 1:
                high.add(comp[x, y])
            elif value == 1 and np.sum(seed_c[:, x, y]) == 1:
                barrier[x, y] = True
        for (x, y), v in np.ndenumerate(comp):
            if v in high and v != 0 and not barrier[x, y]:
                seed_c[c, x, y] = 1
    return seed_c
