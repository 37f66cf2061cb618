"""Per-image valid-extent masking: exact variable-size forwards on one canvas.

The reference runs its fully-convolutional net at every image's exact size
(``training/tools/test-ms-f.py:115-130`` reshapes the data blob per image),
which on TPU would force one XLA compile per image shape.  The batched /
device pipelines instead pack images onto a shared static canvas — but a
naive zero-padded canvas is NOT equivalent to an exact-size forward: after
the first conv layer the region beyond an image's true extent carries
bias/ReLU garbage which bleeds back across the border through every later
conv and pool (the "border perturbation" measured at 0.9928 mean mask
agreement in round 3).

Zeroing the region beyond the valid extent *before every op that mixes
spatial positions* makes the canvas forward EXACT, because every such op in
the DeepLab family then sees precisely what its exact-size counterpart sees:

- **Convolutions** zero-pad their borders; masked canvas taps beyond the
  valid extent read 0 — identical to the exact-size zero padding.
- **Caffe MAX pooling** ignores the pad region (conceptually -inf).  On the
  canvas the straddling windows read masked zeros instead; every pool input
  in these models is post-ReLU (>= 0), so extra zeros can never win a max
  that clipped windows would not also produce.
- **Caffe AVE pooling** (pool5a, 3x3/pad-1/stride-1) divides by the window's
  intersection with the *padded* extent, which for this geometry is always 9
  (``ops/pooling.py``); masked zeros contribute 0 to the sum exactly like
  the exact-size pad cells, and interior canvas divisors are also 9.
- **BatchNorm / bias / ReLU** act pointwise and are re-masked before the
  next spatial op, so their nonzero output on the dead region never
  propagates.

Valid extents shrink through strided ops with the Caffe output-size rules:
pool k3/s2/p1 maps v -> floor(v/2)+1 (== ceil((v-1)/2)+1; the Caffe
last-window clip never fires for this geometry), and conv k/s/p maps
v -> floor((v + 2p - k)/s) + 1.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def valid_mask(h: int, w: int, vh: jnp.ndarray, vw: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, 1) {0,1} mask of rows < vh and cols < vw (vh/vw: (B,) f32)."""
    rh = jnp.arange(h, dtype=jnp.float32)[None, :] < vh[:, None]
    rw = jnp.arange(w, dtype=jnp.float32)[None, :] < vw[:, None]
    return (rh[:, :, None] & rw[:, None, :])[..., None]


def apply_valid_mask(
    x: jnp.ndarray, vh: Optional[jnp.ndarray], vw: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Zero x beyond the per-image valid extent; identity when vh is None."""
    if vh is None:
        return x
    return x * valid_mask(x.shape[1], x.shape[2], vh, vw).astype(x.dtype)


def masked_pool_input(
    x: jnp.ndarray, vh: Optional[jnp.ndarray], vw: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Mask ``x`` as the input of a following Caffe MAX pool.

    EXACTNESS INVARIANT: the masked-canvas forward equals the exact-size
    forward for MAX pooling only when the pool input is non-negative
    (post-ReLU) — masked zeros then never beat a real activation that a
    clipped exact-size window would also keep (module docstring above).
    Every max-pool input in the shipped model families is post-ReLU; a
    future architecture that pools a *signed* activation through this path
    would be silently border-perturbed while reporting exactness.  Set
    ``DSRG_CHECK_MASKING=1`` to verify the invariant at runtime (host
    debug callback) so such a violation fails loudly instead.
    """
    if vh is not None and os.environ.get("DSRG_CHECK_MASKING"):
        def _check(xmin):
            if not xmin >= 0:
                raise AssertionError(
                    f"masked-canvas MAX pool input has negative values "
                    f"(min={xmin}); exactness requires post-ReLU "
                    f"(non-negative) pool inputs — see models/masking.py"
                )
        jax.debug.callback(_check, jnp.min(x.astype(jnp.float32)))
    return apply_valid_mask(x, vh, vw)


def split_valid_hw(
    valid_hw: Optional[jnp.ndarray],
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """(B, 2) -> ((B,), (B,)) f32 extents, or (None, None)."""
    if valid_hw is None:
        return None, None
    v = jnp.asarray(valid_hw, jnp.float32)
    return v[:, 0], v[:, 1]


def pool_out_extent(v: jnp.ndarray) -> jnp.ndarray:
    """Caffe 3x3/stride-2/pad-1 pooled extent: ceil((v-1)/2)+1 == floor(v/2)+1."""
    return jnp.floor(v / 2.0) + 1.0


def conv_out_extent(v: jnp.ndarray, k: int, s: int, p: int) -> jnp.ndarray:
    """Caffe conv output extent: floor((v + 2p - k)/s) + 1."""
    return jnp.floor((v + 2.0 * p - k) / s) + 1.0
