"""DeepLab-LargeFOV VGG16 backbone with multi-scale (MSc) dilated heads.

TPU-native re-design of the reference's declarative Caffe graph
(``training/experiment/seed_mc/train-s.prototxt:41-744`` /
``deploy.prototxt``): one flax module, NHWC layout, bfloat16-capable compute,
stride-8 output.

Structure (output stride 8 — 321x321 input -> 41x41 score maps):

  conv1_x(64) -> pool1 MAX 3x3/2   conv2_x(128) -> pool2 MAX 3x3/2
  conv3_x(256) -> pool3 MAX 3x3/2  conv4_x(512) -> pool4 MAX 3x3/1
  conv5_x(512, dilation 2) -> pool5 MAX 3x3/1 -> pool5a AVE 3x3/1
  4 parallel heads, dilation d in {6, 12, 18, 24}:
     fc6_d 3x3x1024 (dil d) -> relu -> dropout(0.5)
     -> fc7_d 1x1x1024 -> relu -> dropout(0.5) -> fc8_d 1x1xC
  summed into the final score map ("fc8-SEC", Eltwise SUM,
  train-s.prototxt:732-744).

All pooling uses Caffe window semantics (see ``dsrg_tpu.ops.pooling``) —
including the stride-1 pool4/pool5 and the AVE pool5a that the LargeFOV
recipe relies on.  Parameter names mirror the prototxt layer names so the
caffemodel importer maps one-to-one.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dsrg_tpu.models.masking import (
    apply_valid_mask,
    masked_pool_input,
    pool_out_extent,
    split_valid_hw,
)
from dsrg_tpu.ops.dropout import CaffeDropout
from dsrg_tpu.ops.pooling import caffe_avg_pool, caffe_max_pool

# (name, out_channels, dilation) per VGG conv stage.
_STAGES: Tuple[Tuple[str, int, int, int], ...] = (
    # name prefix, n convs, channels, dilation
    ("conv1", 2, 64, 1),
    ("conv2", 2, 128, 1),
    ("conv3", 3, 256, 1),
    ("conv4", 3, 512, 1),
    ("conv5", 3, 512, 2),
)
# pool stride per stage (pool5a AVE handled separately)
_POOL_STRIDE = (2, 2, 2, 1, 1)


class DeepLabLargeFOV(nn.Module):
    """VGG16 DeepLab-LargeFOV with summed multi-dilation heads.

    Attributes:
      num_classes: score channels (21 for VOC, 81 for COCO).
      head_dilations: dilation of each parallel fc6 head (reference: 6/12/18/24).
      dropout_rate: dropout after fc6/fc7 (reference 0.5).
      compute_dtype: activation dtype (bfloat16 for speed; params stay fp32).
    """

    num_classes: int = 21
    head_dilations: Sequence[int] = (6, 12, 18, 24)
    dropout_rate: float = 0.5
    compute_dtype: Any = jnp.float32
    # 8-bit dropout masks (4x less RNG traffic; same Bernoulli(0.5)
    # distribution, different draws per key — see ops/dropout.py)
    dropout_bits8: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        valid_hw: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, H, W, 3) mean-subtracted BGR images. Returns (B, H/8, W/8, C).

        ``valid_hw``: optional (B, 2) per-image valid extents on a shared
        canvas.  When given, the region beyond each image's extent is zeroed
        before every spatial-mixing op, which makes the canvas forward EXACT
        vs running the net at each image's true size (see
        ``dsrg_tpu.models.masking``); callers crop the score map to
        ``(h-1)//8+1`` rows/cols per image.  ``None`` (the default) is the
        plain full-canvas forward with zero overhead.
        """
        x = x.astype(self.compute_dtype)
        vh, vw = split_valid_hw(valid_hw)

        for (name, n_convs, ch, dil), pstride in zip(_STAGES, _POOL_STRIDE):
            for i in range(1, n_convs + 1):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding=dil,
                    kernel_dilation=(dil, dil),
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"{name}_{i}",
                )(apply_valid_mask(x, vh, vw))
                x = nn.relu(x)
            x = caffe_max_pool(masked_pool_input(x, vh, vw), 3, pstride, 1)
            if pstride == 2 and vh is not None:
                vh, vw = pool_out_extent(vh), pool_out_extent(vw)
        x = caffe_avg_pool(apply_valid_mask(x, vh, vw), 3, 1, 1)  # pool5a
        x = apply_valid_mask(x, vh, vw)  # shared input of all dilated heads

        scores = None
        for k, dil in enumerate(self.head_dilations, start=1):
            h = nn.Conv(
                1024, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                dtype=self.compute_dtype, param_dtype=jnp.float32, name=f"fc6_{k}",
            )(x)
            h = nn.relu(h)
            h = CaffeDropout(self.dropout_rate, bits8=self.dropout_bits8)(
                h, deterministic=not train)
            h = nn.Conv(
                1024, (1, 1), dtype=self.compute_dtype, param_dtype=jnp.float32,
                name=f"fc7_{k}",
            )(h)
            h = nn.relu(h)
            h = CaffeDropout(self.dropout_rate, bits8=self.dropout_bits8)(
                h, deterministic=not train)
            h = nn.Conv(
                self.num_classes, (1, 1),
                kernel_init=nn.initializers.normal(stddev=0.01),
                bias_init=nn.initializers.zeros,
                dtype=self.compute_dtype, param_dtype=jnp.float32,
                name=f"fc8-SEC_{k}",
            )(h)
            scores = h if scores is None else scores + h

        return scores.astype(jnp.float32)
