"""ctypes bindings to the native host-side engines (``native/*.cpp``).

The native library is optional: ``available()`` reports whether the shared
object exists (build with ``make -C native``); callers fall back to the JAX
engines when it doesn't.  ``build()`` compiles it on demand with the local
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdsrg_native.so")

_lib: Optional[ctypes.CDLL] = None


def build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return True
    except Exception as e:  # toolchain missing etc.
        print("native build failed:", e)
        return False


def available() -> bool:
    return os.path.exists(_SO_PATH)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_SO_PATH)
        fp = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        lib.dsrg_crf_mean_field.argtypes = [
            fp, fp, fp, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, fp,
        ]
        lib.dsrg_crf_reference.argtypes = [
            fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, fp,
        ]
        lib.dsrg_region_grow.argtypes = [
            fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, fp,
        ]
        lib.dsrg_permutohedral_filter.argtypes = [
            fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp,
        ]
        lib.dsrg_crf_permutohedral.argtypes = [
            fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, fp,
        ]
        _lib = lib
    return _lib


def crf_cpu(image: np.ndarray, unary: np.ndarray, maxiter: int = 10,
            scale_factor: float = 1.0, color_factor: float = 13.0) -> np.ndarray:
    """Native CPU mirror of ``dsrg_tpu.ops.crf.CRF`` (H, W, M) -> (H, W, M)."""
    lib = _load()
    h, w, m = unary.shape
    img = np.ascontiguousarray(image, np.float32).reshape(h * w * 3)
    un = np.ascontiguousarray(unary, np.float32).reshape(h * w * m)
    out = np.empty(h * w * m, np.float32)
    lib.dsrg_crf_reference(img, un, h, w, m, maxiter,
                           np.float32(scale_factor), np.float32(color_factor), out)
    return out.reshape(h, w, m)


def permutohedral_filter(feats: np.ndarray, values: np.ndarray) -> np.ndarray:
    """O(N*(d+1)) lattice Gaussian filter: (N, d) feats, (N, c) values -> (N, c)."""
    lib = _load()
    n, d = feats.shape
    c = values.shape[1]
    f = np.ascontiguousarray(feats, np.float32)
    v = np.ascontiguousarray(values, np.float32)
    out = np.empty((n, c), np.float32)
    lib.dsrg_permutohedral_filter(f, v, n, d, c, out)
    return out


def crf_permutohedral(image: np.ndarray, unary: np.ndarray, maxiter: int = 10,
                      scale_factor: float = 1.0, color_factor: float = 13.0) -> np.ndarray:
    """Permutohedral-lattice CPU CRF — the faithful reference-host baseline.

    Same (H, W, M) surface as :func:`crf_cpu`, but O(N) splat/blur/slice like
    the reference's ``CRF/src/permutohedral.cpp`` instead of exact N^2 kernels.
    """
    lib = _load()
    h, w, m = unary.shape
    img = np.ascontiguousarray(image, np.float32).reshape(h * w * 3)
    un = np.ascontiguousarray(unary, np.float32).reshape(h * w * m)
    out = np.empty(h * w * m, np.float32)
    lib.dsrg_crf_permutohedral(img, un, h, w, m, maxiter,
                               np.float32(scale_factor), np.float32(color_factor), out)
    return out.reshape(h, w, m)


def region_grow_cpu(labels: np.ndarray, cues: np.ndarray, probs: np.ndarray,
                    th1: float = 0.99, th2: float = 0.85) -> np.ndarray:
    """Native CPU mirror of ``dsrg_tpu.ops.grow``: (M,), (M,h,w), (M,h,w) -> (M,h,w)."""
    lib = _load()
    m, h, w = cues.shape
    lab = np.ascontiguousarray(labels, np.float32)
    cu = np.ascontiguousarray(cues, np.float32).reshape(m * h * w)
    pr = np.ascontiguousarray(probs, np.float32).reshape(m * h * w)
    out = np.empty(m * h * w, np.float32)
    lib.dsrg_region_grow(lab, cu, pr, m, h, w, np.float32(th1), np.float32(th2), out)
    return out.reshape(m, h, w)
