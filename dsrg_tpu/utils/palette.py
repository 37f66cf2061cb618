"""VOC-style palette PNG IO.

The reference writes prediction masks two ways: raw grayscale pngs via
``cv2.imwrite`` (``test-ms.py:59-65``) and palette pngs via the ``png``
module with the 21-color VOC map (``show-result.py:55-61``).  Both are
supported here through PIL (no cv2 dependency).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

# The 21 VOC colors used across the reference tools (test-ms.py:50-55),
# scaled to bytes.  Index 255 is conventionally the ignore boundary (white).
_BASE = [
    (0.0, 0.0, 0.0), (0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.5, 0.5, 0.0),
    (0.0, 0.0, 0.5), (0.5, 0.0, 0.5), (0.0, 0.5, 0.5), (0.5, 0.5, 0.5),
    (0.25, 0.0, 0.0), (0.75, 0.0, 0.0), (0.25, 0.5, 0.0), (0.75, 0.5, 0.0),
    (0.25, 0.0, 0.5), (0.75, 0.0, 0.5), (0.25, 0.5, 0.5), (0.75, 0.5, 0.5),
    (0.0, 0.25, 0.0), (0.5, 0.25, 0.0), (0.0, 0.75, 0.0), (0.5, 0.75, 0.0),
    (0.0, 0.25, 0.5),
]
VOC_PALETTE = [tuple(int(255 * v) for v in c) for c in _BASE]

VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def write_png(mask: np.ndarray, path: str) -> None:
    """Raw label png (cv2.imwrite equivalent, test-ms.py:64)."""
    Image.fromarray(mask.astype(np.uint8), mode="L").save(path)


def write_palette_png(mask: np.ndarray, path: str) -> None:
    """Palette png with the VOC colormap (show-result.py:55-61 equivalent)."""
    img = Image.fromarray(mask.astype(np.uint8), mode="P")
    pal = list(VOC_PALETTE) + [(255, 255, 255)] * (256 - len(VOC_PALETTE))
    img.putpalette([v for rgb in pal for v in rgb])
    img.save(path)


def read_mask_png(path: str) -> np.ndarray:
    """Read a label mask png (palette or grayscale) as (H, W) uint8 labels."""
    img = Image.open(path)
    if img.mode == "P" or img.mode == "L":
        return np.asarray(img, dtype=np.uint8)
    return np.asarray(img.convert("L"), dtype=np.uint8)
