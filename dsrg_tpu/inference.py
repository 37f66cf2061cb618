"""Single- and multi-scale inference with optional CRF post-processing.

Mirrors the reference test tools (``training/tools/test.py`` /
``test-ms.py`` / ``test-ms-f.py``): per scale, resize the image, forward to
the fc8-SEC score map, resize scores back to the original resolution and sum;
softmax + probability floor 1e-5; optionally smooth with
``CRF(im, log(probs), scale_factor=1.0)``; argmax.

TPU-shape note: the reference runs the fully-convolutional net at every
image's exact size, which on TPU would recompile per shape.  By default we
zero-pad the (mean-subtracted) input up to a shape bucket and crop the score
map back — mean-pixel context beyond the true border instead of the conv
zero-padding, a border-only perturbation.  Pass ``bucket=1`` for exact
per-shape compilation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom as ndzoom

from dsrg_tpu.data.voc import BGR_MEAN
from dsrg_tpu.ops.crf import CRF

EPS = 1e-5  # probability floor (test-ms.py:102-103)


class Predictor:
    def __init__(self, model, params, num_classes: int = 21, bucket: int = 64):
        self.model = model
        # accept either a bare params tree or a full variables dict
        # ({"params": ..., "batch_stats": ...} for BN backbones)
        if isinstance(params, dict) and "params" in params:
            self.variables = params
        else:
            self.variables = {"params": params}
        self.num_classes = num_classes
        self.bucket = max(int(bucket), 1)
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )

    def _pad_size(self, s: int) -> int:
        if self.bucket == 1:
            return s
        b = self.bucket
        return ((s + b - 1) // b) * b + 1  # stride-8-friendly 8k+1 shapes

    def scores_at_size(self, image_bgr: np.ndarray) -> np.ndarray:
        """Forward one (h, w, 3) mean-subtracted BGR image -> (h', w', M) scores."""
        h, w = image_bgr.shape[:2]
        ph, pw = self._pad_size(h), self._pad_size(w)
        x = np.zeros((1, ph, pw, 3), np.float32)
        x[0, :h, :w] = image_bgr
        scores = np.asarray(self._fwd(self.variables, jnp.asarray(x)))[0]
        oh, ow = (h - 1) // 8 + 1, (w - 1) // 8 + 1
        return scores[:oh, :ow]

    def predict_probs(
        self,
        image_rgb: np.ndarray,
        sizes: Optional[Sequence[int]] = None,
        scales: Optional[Sequence[float]] = None,
    ) -> np.ndarray:
        """Multi-scale score averaging -> (H, W, M) softmax probabilities.

        ``sizes``: absolute square sizes (test-ms.py:90 uses [241, 321, 401]);
        ``scales``: relative zoom factors (test-ms-f.py:121 uses
        [0.75, 1, 1.25]).  Exactly one must be given.
        """
        im = np.asarray(image_rgb, np.float32)
        d1, d2 = float(im.shape[0]), float(im.shape[1])
        bgr = im[:, :, ::-1] - BGR_MEAN

        if sizes is not None:
            zooms = [(s / d1, s / d2) for s in sizes]
        else:
            zooms = [(s, s) for s in (scales or (1.0,))]

        scores_all = 0.0
        for zy, zx in zooms:
            scaled = ndzoom(bgr, (zy, zx, 1.0), order=1)
            scores = self.scores_at_size(scaled)
            scores = ndzoom(
                scores, (d1 / scores.shape[0], d2 / scores.shape[1], 1.0), order=1
            )
            scores_all = scores_all + scores

        e = np.exp(scores_all - scores_all.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        return np.maximum(probs, EPS)

    def predict_mask(
        self,
        image_rgb: np.ndarray,
        sizes: Optional[Sequence[int]] = None,
        scales: Optional[Sequence[float]] = None,
        smooth: bool = True,
        restrict_labels: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Full reference predict_mask pipeline -> (H, W) uint8 label mask.

        ``restrict_labels``: optional class-index subset (incl. background) to
        restrict the argmax to — the generate_train_gt.py behavior
        (``generate_train_gt.py:98-104``).
        """
        probs = self.predict_probs(image_rgb, sizes=sizes, scales=scales)
        if smooth:
            probs = np.asarray(CRF(image_rgb, np.log(probs), scale_factor=1.0))
        if restrict_labels is not None:
            sel = probs[:, :, restrict_labels]
            return np.asarray(restrict_labels)[sel.argmax(-1)].astype(np.uint8)
        return probs.argmax(-1).astype(np.uint8)
