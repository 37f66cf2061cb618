"""COCO 81-class cue dataset — equivalent of ``AnnotationLayerCOCO``
(``pylayers/pylayers/pylayers.py:389-512``).

Reads (image, label) path pairs; resizes images to ``new_size`` with scipy
order-1 zoom; builds a dense per-class cue volume of shape
(new_h/8 + 1, new_w/8 + 1, 81) from the *subsampled* label png (every
non-ignore pixel becomes a cue — the reference builds cues at full label
resolution, ``pylayers.py:494-498``, while declaring the top at score
resolution, ``:416``; we build them directly at score resolution via the same
lossless stride-8 subsampling as the Interp layer); multi-hot image labels
from the classes present.  The random mirror is applied on device inside the
train step, jointly with the image (``:500-503``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from PIL import Image
from scipy.ndimage import zoom as ndzoom

from dsrg_tpu.data.voc import _EpochOrder, load_image_bgr, read_pair_list

COCO_MEAN = np.array([104.008, 116.669, 122.675], np.float32)


class COCOCueDataset(_EpochOrder):
    def __init__(
        self,
        root: str,
        source: str,
        batch_size: int = 10,
        new_size: tuple = (321, 321),
        num_classes: int = 81,
        mean: np.ndarray = COCO_MEAN,
        ignore_label: int = 255,
        seed: int = 0,
    ):
        self.root = root
        self.entries = read_pair_list(source)
        self.batch_size = batch_size
        self.new_h, self.new_w = new_size
        self.num_classes = num_classes
        self.mean = np.asarray(mean, np.float32)
        self.ignore_label = ignore_label
        super().__init__(len(self.entries), True, seed)
        self.cue_h = self.new_h // 8 + 1
        self.cue_w = self.new_w // 8 + 1

    def __len__(self) -> int:
        return len(self.entries)

    def _load_one(self, image_path: str, label_path: str):
        image = load_image_bgr(self.root + image_path)
        image = ndzoom(
            image,
            (self.new_h / image.shape[0], self.new_w / image.shape[1], 1.0),
            order=1,
        )
        image = image - self.mean

        label = np.asarray(Image.open(self.root + label_path), np.int32)
        if label.ndim == 3:
            label = label[..., 0]
        # resize label (nearest) to cue resolution
        lh = np.clip(
            np.round(np.linspace(0, label.shape[0] - 1, self.cue_h)).astype(int), 0, None
        )
        lw = np.clip(
            np.round(np.linspace(0, label.shape[1] - 1, self.cue_w)).astype(int), 0, None
        )
        small = label[np.ix_(lh, lw)]

        cues = np.zeros((self.cue_h, self.cue_w, self.num_classes), np.float32)
        valid = small != self.ignore_label
        cues[valid, small[valid]] = 1.0

        image_label = np.zeros(self.num_classes, np.float32)
        present = np.unique(label)
        present = present[present != self.ignore_label]
        image_label[present] = 1.0
        return image.astype(np.float32), image_label, cues

    def next_batch(self) -> dict:
        n = self.batch_size
        images = np.empty((n, self.new_h, self.new_w, 3), np.float32)
        labels = np.empty((n, self.num_classes), np.float32)
        cues = np.empty((n, self.cue_h, self.cue_w, self.num_classes), np.float32)
        for i in range(n):
            img_path, lbl_path = self.entries[self._next_index()]
            images[i], labels[i], cues[i] = self._load_one(img_path, lbl_path)
        return {"images": images, "labels": labels, "cues": cues}

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.next_batch()
