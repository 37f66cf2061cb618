"""Gaussian-kernel feature construction for dense-CRF pairwise potentials.

Mirrors the feature definitions of the reference engine
(``CRF/src/densecrf.cpp:61-81``):

* spatial ("Gaussian") features, d=2: ``(x/sx, y/sy)`` where x is the column
  and y the row index;
* bilateral features, d=5: ``(x/sx, y/sy, c0/sr, c1/sg, c2/sb)`` with the
  image's channel values in stored order (the reference treats the raveled
  image bytes channel-by-channel, so channel order cancels out whenever the
  three color factors are equal — which they always are in DSRG).
"""

from __future__ import annotations

import jax.numpy as jnp


def spatial_features(h: int, w: int, sx: float, sy: float, dtype=jnp.float32) -> jnp.ndarray:
    """(h*w, 2) features (x/sx, y/sy), row-major pixel order."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    fx = jnp.broadcast_to(xs[None, :], (h, w)) / sx
    fy = jnp.broadcast_to(ys[:, None], (h, w)) / sy
    return jnp.stack([fx, fy], axis=-1).reshape(h * w, 2)


def bilateral_features(
    image: jnp.ndarray,
    sx: float,
    sy: float,
    sr: float,
    sg: float,
    sb: float,
) -> jnp.ndarray:
    """(h*w, 5) features from an (h, w, 3) image in [0, 255].

    The reference converts the image to bytes (``CRF.py:32``); callers should
    round/clip before invoking when parity with the uint8 path matters.
    """
    h, w, _ = image.shape
    sp = spatial_features(h, w, sx, sy, dtype=image.dtype)
    scale = jnp.asarray([sr, sg, sb], dtype=image.dtype)
    col = (image / scale[None, None, :]).reshape(h * w, 3)
    return jnp.concatenate([sp, col], axis=-1)
