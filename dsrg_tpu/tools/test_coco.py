"""COCO inference + streaming mIoU — mirror of ``training/tools/test-coco.py``.

Single 481 scale, vectorized-bincount confusion matrix, running mIoU printed
every 100 images (``test-coco.py:62-81,147-169``).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
from PIL import Image

from dsrg_tpu.tools._infer_common import build_arg_parser, load_predictor
from dsrg_tpu.utils.confusion import ConfusionMatrix
from dsrg_tpu.utils.palette import read_mask_png, write_png


def run_coco(args, sizes=None, scales=None) -> float:
    predictor = load_predictor(args.model, args.num_classes)
    rows = [ln.strip().split() for ln in open(args.image_list) if ln.strip()]
    conf = ConfusionMatrix(args.num_classes)
    if args.output_dir and not osp.isdir(args.output_dir):
        os.makedirs(args.output_dir)
    for index, row in enumerate(rows):
        img_path = row[0]
        gt_path = row[1] if len(rows[0]) > 1 else None
        img = Image.open(osp.join(args.data_dir, img_path))
        if img.mode != "RGB":  # reference skips non-RGB (test-coco-f.py)
            print("skip non-RGB", img_path, flush=True)
            continue
        image = np.asarray(img)
        mask = predictor.predict_mask(image, sizes=sizes, scales=scales, smooth=args.smooth)
        if args.output_dir:
            out = osp.splitext(osp.basename(img_path))[0] + ".png"
            write_png(mask, osp.join(args.output_dir, out))
        if gt_path:
            gt = read_mask_png(osp.join(args.data_dir, gt_path))
            conf.add(gt, mask)
            if (index + 1) % 100 == 0:
                ave_j, _, _ = conf.jaccard()
                print(f"{index + 1} images, running meanIOU: {ave_j:.4f}", flush=True)
    if conf.M.sum() > 0:
        ave_j, _, _ = conf.jaccard()
        print("final meanIOU:", ave_j)
        return ave_j
    return float("nan")


def main(argv=None) -> None:
    p = build_arg_parser(__doc__)
    p.set_defaults(num_classes=81)
    args = p.parse_args(argv)
    run_coco(args, sizes=[481])


if __name__ == "__main__":
    main()
