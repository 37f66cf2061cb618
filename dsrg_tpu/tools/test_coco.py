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
    predictor = load_predictor(
        args.model, args.num_classes, getattr(args, "model_name", "vgg16"),
        bucket=int(getattr(args, "bucket", 1)),
        mesh=bool(getattr(args, "mesh", False)),
    )
    rows = [ln.strip().split() for ln in open(args.image_list) if ln.strip()]
    conf = ConfusionMatrix(args.num_classes)
    if args.output_dir and not osp.isdir(args.output_dir):
        os.makedirs(args.output_dir)
    has_gt = rows and len(rows[0]) > 1

    from dsrg_tpu.utils import watchdog

    rss_limit, stall = watchdog.arm(args, persist=bool(args.output_dir),
                                    describe="image")

    def _out_path(row):
        return osp.join(args.output_dir,
                        osp.splitext(osp.basename(row[0]))[0] + ".png")

    if getattr(args, "skip_existing", False) and args.output_dir:
        done_rows, rows = watchdog.split_existing(rows, _out_path)
        # keep the streaming/final mIoU COMPLETE across relaunches: fold the
        # already-dumped masks (this model's own deterministic outputs) back
        # into the confusion from disk instead of silently dropping them
        for row in done_rows:
            if len(row) > 1:
                conf.add(read_mask_png(osp.join(args.data_dir, row[1])),
                         read_mask_png(_out_path(row)))

    def score(index, row, mask):
        if args.output_dir:
            write_png(mask, _out_path(row))
        else:
            # reference parity: no --output shows an interactive preview
            # (test-coco.py:175-183); image reloaded — the rare interactive
            # case, keeping the hot streaming path image-free
            from dsrg_tpu.tools._infer_common import preview_mask

            preview_mask(
                np.asarray(
                    Image.open(osp.join(args.data_dir, row[0])).convert("RGB")
                ),
                mask, args.num_classes,
            )
        if has_gt:
            gt = read_mask_png(osp.join(args.data_dir, row[1]))
            conf.add(gt, mask)
            if (index + 1) % 100 == 0:
                ave_j, _, _ = conf.jaccard()
                print(f"{index + 1} images, running meanIOU: {ave_j:.4f}", flush=True)
        stall.tick()
        if (index + 1) % 100 == 0:
            watchdog.maybe_restart(rss_limit, index + 1, len(rows))

    from dsrg_tpu.tools._infer_common import resolve_pipeline

    engine, chunk, pipeline, use_device = resolve_pipeline(
        args, sizes, scales, exact_canvas=predictor.exact_canvas
    )

    def rgb_rows():
        for row in rows:
            img = Image.open(osp.join(args.data_dir, row[0]))
            if img.mode != "RGB":  # reference skips non-RGB (test-coco-f.py)
                print("skip non-RGB", row[0], flush=True)
                continue
            yield row, np.asarray(img)

    if use_device:
        kept = []  # generator stays >= one chunk ahead of the mask stream

        def gen():
            for row, img in rgb_rows():
                kept.append(row)
                yield img

        stream = predictor.iter_masks_device(
            gen(), sizes=sizes, scales=scales, chunk=chunk, smooth=args.smooth,
            canvas_bucket=int(getattr(args, "canvas_bucket", 32)),
            in_flight=int(getattr(args, "in_flight", 2)),
        )
        for index, (_, mask) in enumerate(stream):
            score(index, kept[index], mask)
    elif chunk > 1:
        # batched host path: one forward per scale per chunk
        index = 0
        batch_rows, batch_imgs = [], []

        def flush():
            nonlocal index
            masks = predictor.predict_masks(
                batch_imgs, sizes=sizes, scales=scales, smooth=args.smooth
            )
            for row, mask in zip(batch_rows, masks):
                score(index, row, mask)
                index += 1
            batch_rows.clear()
            batch_imgs.clear()

        for row, img in rgb_rows():
            batch_rows.append(row)
            batch_imgs.append(img)
            if len(batch_imgs) == chunk:
                flush()
        if batch_imgs:
            flush()
    else:
        index = 0
        for row, img in rgb_rows():
            mask = predictor.predict_mask(
                img, sizes=sizes, scales=scales, smooth=args.smooth,
                crf_engine=engine,
            )
            score(index, row, mask)
            index += 1
    stall.close()
    if conf.M.sum() > 0:
        ave_j, _, _ = conf.jaccard()
        print("final meanIOU:", ave_j)
        return ave_j
    return float("nan")


def main(argv=None) -> None:
    p = build_arg_parser(__doc__)
    p.set_defaults(num_classes=81)
    p.add_argument("--sizes", type=int, nargs="+", default=[481],
                   help="absolute forward sizes (reference default 481)")
    args = p.parse_args(argv)
    run_coco(args, sizes=args.sizes)


if __name__ == "__main__":
    main()
