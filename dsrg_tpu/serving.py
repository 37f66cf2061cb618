"""Model export / serving.

The reference's "deployment" story is a Caffe ``deploy.prototxt`` + a
``.caffemodel`` loaded into a fresh process.  The TPU-native equivalent:
serialize the jitted deploy forward (optionally fused with softmax + the
dense-CRF refinement head) as a StableHLO artifact via ``jax.export`` — a
self-contained, weights-embedded program that any JAX process (or an XLA
runtime) can load and call without the framework's Python code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from dsrg_tpu.ops.softmax import floored_softmax


def make_deploy_fn(model, variables, input_shape: Tuple[int, int, int, int],
                   with_softmax: bool = True):
    """Closure over weights: (B, H, W, 3) images -> scores or probabilities."""

    def fn(images):
        scores = model.apply(variables, images, train=False)
        if with_softmax:
            return floored_softmax(scores)
        return scores

    example = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    return fn, example


def export_deploy(model, variables, path: str,
                  input_shape: Tuple[int, int, int, int] = (1, 321, 321, 3),
                  with_softmax: bool = True,
                  platforms: Optional[list] = None) -> str:
    """Serialize the deploy forward to ``path`` (StableHLO bytes)."""
    fn, example = make_deploy_fn(model, variables, input_shape, with_softmax)
    exp = jax_export.export(
        jax.jit(fn), platforms=platforms
    )(example)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


class ServingModel:
    """Load an exported deploy artifact and run inference."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self.input_shape = tuple(self._exported.in_avals[0].shape)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._exported.call(jnp.asarray(images, jnp.float32)))
