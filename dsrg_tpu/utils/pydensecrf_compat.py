"""Alternative CRF parameterization (``training/tools/utils.py`` parity).

The reference ships a ``dense_crf()`` helper built on the external pydensecrf
package with different defaults (sxy 3 Gaussian / 49 bilateral, compat 3 / 4,
srgb 5).  It is dead code there — only referenced from commented-out lines —
and *buggy*: it returns the input probabilities instead of the inference
result (``utils.py:46-48``).  We expose the same signature with the same
parameterization, implemented on the in-house engines, and actually return
the inference result (the bug is not worth reproducing in a live API; a
``faithful_bug=True`` switch restores it for strict parity).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dsrg_tpu.ops.crf.api import DenseCRF, PottsCompatibility


def dense_crf(
    probs: np.ndarray,
    img: np.ndarray = None,
    n_iters: int = 10,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 49.0,
    compat_bilateral: float = 4.0,
    srgb_bilateral: float = 5.0,
    faithful_bug: bool = False,
) -> np.ndarray:
    """(H, W, M) probabilities (+ optional (H, W, 3) image) -> marginals."""
    if faithful_bug:
        return probs  # reference utils.py:46-48 returns the input
    h, w, m = probs.shape
    crf = DenseCRF(w, h, m)
    unary_cost = -np.log(np.maximum(probs, 1e-20)).reshape(h * w, m)
    crf.set_unary_energy(unary_cost.astype(np.float32).ravel())
    crf.add_pairwise_gaussian(
        sxy_gaussian, sxy_gaussian, PottsCompatibility(compat_gaussian)
    )
    if img is not None:
        crf.add_pairwise_bilateral(
            sxy_bilateral, sxy_bilateral,
            srgb_bilateral, srgb_bilateral, srgb_bilateral,
            jnp.asarray(img, jnp.float32), PottsCompatibility(compat_bilateral),
        )
    return crf.inference(n_iters).reshape(h, w, m)
