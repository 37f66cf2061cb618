"""Align-corners bilinear interpolation as dense matmuls.

Two reference behaviors are reproduced exactly:

* ``scipy.ndimage.zoom(..., order=1)`` as used by the Caffe ``CRFLayer`` /
  ``DSRGLayer.refinement`` to shrink 321x321 images to the 41x41 score
  resolution (``pylayers/pylayers/pylayers.py:72,316``) and by every test tool
  to rescale images/score maps.  Empirically (and per scipy's spline-coeff
  mapping) order-1 zoom maps output coordinate ``i`` to input coordinate
  ``i * (in - 1) / (out - 1)`` — the align-corners convention.

* the Caffe ``Interp`` layer with ``shrink_factor: 8``
  (``training/experiment/seed_mc/train-f.prototxt:721-731``): output size is
  ``(in - 1) // 8 + 1`` and sampling is align-corners bilinear, which for an
  exact integer stride degenerates to pure subsampling (this is why running it
  on an integer label map is lossless in the reference).

Rather than gather-based interpolation, we materialize the (tiny) row/column
interpolation matrices and apply them with two matmuls — MXU-friendly, fuses
into the surrounding jit program, and bit-equivalent to the scipy path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def zoom_matrix(in_size: int, out_size: int, dtype=np.float32) -> np.ndarray:
    """Dense (out_size, in_size) align-corners linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m.astype(dtype)
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        x = i * scale
        lo = int(np.floor(x))
        lo = min(lo, in_size - 2)
        frac = x - lo
        m[i, lo] = 1.0 - frac
        m[i, lo + 1] = frac
    return m.astype(dtype)


def zoom_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Align-corners bilinear resize of an (..., H, W, C) array via matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(zoom_matrix(h, out_h))
    mw = jnp.asarray(zoom_matrix(w, out_w))
    # (..., H, W, C): contract H then W.
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    y = jnp.einsum("pw,...owc->...opc", mw, y)
    return y


def caffe_interp_out_size(in_size: int, shrink_factor: int) -> int:
    """Caffe ``Interp`` layer output size for shrink_factor (pad_beg=pad_end=0)."""
    return (in_size - 1) // shrink_factor + 1


def caffe_interp_shrink(x: jnp.ndarray, shrink_factor: int) -> jnp.ndarray:
    """Caffe ``Interp`` shrink on an (..., H, W, C) array.

    For the recipe's 321 -> 41 case the align-corners stride is exactly 8, so
    this is pure subsampling and is safe on integer label maps.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh = caffe_interp_out_size(h, shrink_factor)
    ow = caffe_interp_out_size(w, shrink_factor)
    if oh > 1 and ow > 1 and (h - 1) % (oh - 1) == 0 and (w - 1) % (ow - 1) == 0:
        sh = (h - 1) // (oh - 1)
        sw = (w - 1) // (ow - 1)
        return x[..., ::sh, ::sw, :]
    return zoom_bilinear(x, oh, ow)
