"""Visualization CLI — mirror of ``training/tools/show-result.py``.

Writes side-by-side (image | prediction | ground truth) palette pngs and
optionally the raw probability arrays (``show-result.py:55-61,94-95``).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
from PIL import Image

from dsrg_tpu.tools._infer_common import build_arg_parser, load_predictor
from dsrg_tpu.utils.palette import VOC_PALETTE, write_palette_png


def _colorize(mask: np.ndarray) -> np.ndarray:
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(VOC_PALETTE)] = np.asarray(VOC_PALETTE, np.uint8)
    pal[255] = (255, 255, 255)
    return pal[mask]


def main(argv=None) -> None:
    p = build_arg_parser(__doc__)
    p.add_argument("--gt", dest="gt_dir", default=None, help="SegmentationClass dir")
    p.add_argument("--save-probs", action="store_true", help="also np.save raw probs")
    args = p.parse_args(argv)

    predictor = load_predictor(args.model, args.num_classes)
    image_ids = [ln.strip() for ln in open(args.image_list) if ln.strip()]
    data_dir = osp.join(args.data_dir, "JPEGImages")
    if args.output_dir and not osp.isdir(args.output_dir):
        os.makedirs(args.output_dir)

    for index, img_id in enumerate(image_ids):
        print(index, img_id, flush=True)
        image = np.asarray(Image.open(osp.join(data_dir, img_id + ".jpg")).convert("RGB"))
        probs = predictor.predict_probs(image, sizes=[241, 321, 401])
        if args.smooth:
            from dsrg_tpu.ops.crf import CRF

            probs = np.asarray(CRF(image, np.log(probs), scale_factor=1.0))
        mask = probs.argmax(-1).astype(np.uint8)

        panels = [image, _colorize(mask)]
        if args.gt_dir:
            gt = np.asarray(Image.open(osp.join(args.gt_dir, img_id + ".png")))
            panels.append(_colorize(gt.astype(np.uint8)))
        side = np.concatenate(panels, axis=1)
        Image.fromarray(side).save(osp.join(args.output_dir, img_id + "_vis.png"))
        write_palette_png(mask, osp.join(args.output_dir, img_id + ".png"))
        if args.save_probs:
            np.save(osp.join(args.output_dir, img_id + ".npy"), probs)


if __name__ == "__main__":
    main()
