"""DeepLab-v2 ResNet-101 backbone with ASPP heads (output stride 8).

The reference recipe family's stronger backbone (BASELINE.json config 5; the
DSRG paper's ResNet-101 variant).  Caffe-DeepLab conventions throughout:

  conv1 7x7/2 (pad 3) + BN + relu -> 161
  pool1 MAX 3x3/2 pad 1 (Caffe window semantics) -> 81
  res2: 3 bottlenecks (256), stride 1
  res3: 4 bottlenecks (512), first stride 2 -> 41
  res4: 23 bottlenecks (1024), stride 1, dilation 2
  res5: 3 bottlenecks (2048), stride 1, dilation 4
  ASPP: four parallel 3x3 convs, dilation {6, 12, 18, 24}, num_classes
        channels each, summed (DeepLab-v2 style, matching the VGG model's
        summed-heads contract).

Strides sit on the first 1x1 conv of a bottleneck and on the projection
shortcut (Caffe ResNet convention, not the torch 3x3-stride placement).
Batch norm runs with frozen statistics by default (Caffe DeepLab freezes BN
during segmentation finetuning); scale/offset remain trainable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dsrg_tpu.models.masking import (
    apply_valid_mask,
    masked_pool_input,
    conv_out_extent,
    pool_out_extent,
    split_valid_hw,
)
from dsrg_tpu.ops.pooling import caffe_max_pool


class Bottleneck(nn.Module):
    features: int  # bottleneck (contracted) width; output is 4x
    stride: int = 1
    dilation: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False, vh=None, vw=None):
        """``vh``/``vw``: per-image valid extents of ``x`` on a shared canvas
        (see ``models.masking``).  Only the 3x3 conv2 mixes spatial positions
        here, so one mask before it (at the post-stride extent) keeps the
        canvas forward exact; the 1x1 convs and the shortcut add are
        pointwise in space."""
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train_bn,
                momentum=0.95,
                epsilon=1e-5,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        needs_proj = x.shape[-1] != self.features * 4 or self.stride != 1
        shortcut = x
        if needs_proj:
            shortcut = nn.Conv(
                self.features * 4, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.compute_dtype, param_dtype=jnp.float32, name="shortcut",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        y = nn.Conv(
            self.features, (1, 1), strides=self.stride, use_bias=False,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        y = nn.relu(bn("bn1")(y))
        if vh is not None and self.stride == 2:
            vh = conv_out_extent(vh, 1, 2, 0)
            vw = conv_out_extent(vw, 1, 2, 0)
        y = nn.Conv(
            self.features, (3, 3), padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation), use_bias=False,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv2",
        )(apply_valid_mask(y, vh, vw))
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=False,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv3",
        )(y)
        y = bn("bn3")(y)
        return nn.relu(y + shortcut)


class ResNet101DeepLab(nn.Module):
    num_classes: int = 21
    head_dilations: Sequence[int] = (6, 12, 18, 24)
    stage_blocks: Sequence[int] = (3, 4, 23, 3)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        train_bn: bool = False,
        valid_hw: Optional[jnp.ndarray] = None,
    ):
        """``valid_hw``: optional (B, 2) per-image valid extents — exact
        shared-canvas forwards, same contract as ``DeepLabLargeFOV``
        (see ``models.masking``; frozen-BN output on the dead region is
        re-masked before every spatial op, so it never crosses the border)."""
        x = x.astype(self.compute_dtype)
        vh, vw = split_valid_hw(valid_hw)
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv1",
        )(apply_valid_mask(x, vh, vw))
        x = nn.BatchNorm(
            use_running_average=not train_bn, momentum=0.95, epsilon=1e-5,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        if vh is not None:
            vh, vw = conv_out_extent(vh, 7, 2, 3), conv_out_extent(vw, 7, 2, 3)
        x = caffe_max_pool(masked_pool_input(x, vh, vw), 3, 2, 1)
        if vh is not None:
            vh, vw = pool_out_extent(vh), pool_out_extent(vw)

        widths = (64, 128, 256, 512)
        strides = (1, 2, 1, 1)
        dilations = (1, 1, 2, 4)
        for s, (n_blocks, w, st, dil) in enumerate(
            zip(self.stage_blocks, widths, strides, dilations), start=2
        ):
            for b in range(n_blocks):
                stride = st if b == 0 else 1
                x = Bottleneck(
                    features=w,
                    stride=stride,
                    dilation=dil,
                    compute_dtype=self.compute_dtype,
                    name=f"res{s}_{b}",
                )(x, train_bn=train_bn, vh=vh, vw=vw)
                if vh is not None and stride == 2:
                    vh = conv_out_extent(vh, 1, 2, 0)
                    vw = conv_out_extent(vw, 1, 2, 0)

        # head names follow the DeepLab-v2 ResNet prototxt (fc1_voc12_c0..c3)
        # so the caffemodel importer maps them directly
        x = apply_valid_mask(x, vh, vw)  # shared input of all dilated heads
        scores = None
        for k, dil in enumerate(self.head_dilations):
            h = nn.Conv(
                self.num_classes, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                kernel_init=nn.initializers.normal(stddev=0.01),
                bias_init=nn.initializers.zeros,
                dtype=self.compute_dtype, param_dtype=jnp.float32, name=f"fc1_voc12_c{k}",
            )(x)
            scores = h if scores is None else scores + h
        return scores.astype(jnp.float32)
