"""dsrg_tpu — TPU-native weakly-supervised semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of speedinghzl/DSRG
(CVPR 2018): DeepLab-LargeFOV training on PASCAL VOC 2012 from image-level
labels + localization cues, with deep seeded region growing, dense-CRF
mean-field refinement, balanced-seed and constrain-to-boundary losses, a
two-stage recipe (DSRG training then retraining on pseudo ground truth), and
the full tool surface (train / single- and multi-scale inference / pseudo-GT
generation / mIoU evaluation / seed-quality measurement / visualization).

Unlike the reference — which crosses GPU<->host boundaries several times per
step (Caffe python layers, host C++ CRF, a multiprocessing pool for region
growing) — the entire training step here is a single jit-compiled on-device
program, data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from dsrg_tpu.ops.softmax import floored_softmax  # noqa: F401
