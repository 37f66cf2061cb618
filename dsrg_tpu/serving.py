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


def export_pipeline(
    model,
    variables,
    path: str,
    canvas_hw: Tuple[int, int] = (512, 512),
    batch: int = 8,
    sizes: Optional[Tuple[int, ...]] = (241, 321, 401),
    scales: Optional[Tuple[float, ...]] = None,
    smooth: bool = True,
    num_classes: int = 21,
    platforms: Optional[list] = None,
) -> str:
    """Serialize the ENTIRE multi-scale inference pipeline as one artifact.

    The exported program is the device-resident test-ms/test-ms-f pipeline
    (``inference.Predictor._build_device_ms``): dynamic per-image resizes to
    each scale, one forward per scale, score fusion, floored softmax, masked
    matmul-grid CRF, argmax.  I/O is serving-friendly: a (batch, H, W, 3)
    uint8 RGB canvas + (batch, 2) true sizes in, (batch, H, W) uint8 masks
    out — the whole reference ``test-ms.py:84-111`` predict_mask per image,
    weights embedded, no framework code needed at load time.
    """
    from dsrg_tpu.inference import Predictor

    pred = Predictor(model, variables, num_classes=num_classes)
    ph, pw = int(canvas_hw[0]), int(canvas_hw[1])
    inner = pred._build_device_ms(
        ph, pw,
        tuple(sizes) if sizes is not None else None,
        tuple(scales) if scales is not None else None,
        bool(smooth),
    )

    def fn(canvas_u8, dims):
        return inner(pred.variables, canvas_u8, dims)

    exp = jax_export.export(jax.jit(fn), platforms=platforms)(
        jax.ShapeDtypeStruct((batch, ph, pw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, 2), jnp.float32),
    )
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


class ServingPipeline:
    """Load an exported pipeline artifact; list of RGB arrays in, masks out.

    Handles the canvas packing/unpacking the exporter's program expects;
    chunks longer lists into the exported batch size (padding the last chunk
    with unit-size dummies whose outputs are dropped).
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self.batch, self.ph, self.pw, _ = self._exported.in_avals[0].shape

    def __call__(self, images_rgb) -> list:
        from dsrg_tpu.inference import pack_canvas

        out = []
        images_rgb = list(images_rgb)
        for c0 in range(0, len(images_rgb), self.batch):
            chunk = images_rgb[c0 : c0 + self.batch]
            canvas, dims = pack_canvas(chunk, self.batch, self.ph, self.pw)
            q = np.asarray(
                self._exported.call(jnp.asarray(canvas), jnp.asarray(dims))
            )
            for i, im in enumerate(chunk):
                out.append(q[i, : im.shape[0], : im.shape[1]])
        return out
