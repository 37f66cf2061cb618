"""End-to-end learning sanity check on a synthetic shapes dataset.

The reference has no automated check that its pipeline actually learns
(SURVEY.md §4: quality control was entirely empirical); VOC data is also not
always at hand.  This tool generates a self-contained weakly-supervised
dataset — colored shapes on textured backgrounds, with SPARSE seed cues in
the reference's pickle format (a few cue points per object + background
points, standing in for CAM + saliency seeds) — then runs the REAL stage-1
DSRG trainer from scratch, the real multi-scale inference CLI path, and the
real evaluator, reporting val mIoU.  Random predictions score ~0.02 mIoU
here; a working DSRG stack reaches >0.5 within a few hundred iterations
because the seed loss + region growing expand the sparse cues to the full
shapes.

Usage::

    python -m dsrg_tpu.tools.synth_check --work-dir /tmp/synth --iters 300
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np
from PIL import Image


FG_COLORS = {1: (205, 60, 55), 2: (55, 190, 70)}  # class -> RGB mean


def _make_image(rng, size: int, n_obj: int):
    """One (image, gt) pair: noisy gray background + colored shapes."""
    base = rng.integers(90, 140)
    img = np.full((size, size, 3), base, np.float32)
    img += rng.normal(0, 12, img.shape)
    gt = np.zeros((size, size), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(n_obj):
        cls = int(rng.integers(1, 3))
        r = int(rng.integers(size // 6, size // 3))
        cy = int(rng.integers(r, size - r))
        cx = int(rng.integers(r, size - r))
        if cls == 1:  # circle
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        else:  # square
            mask = (np.abs(yy - cy) <= r) & (np.abs(xx - cx) <= r)
        color = np.asarray(FG_COLORS[cls], np.float32)
        img[mask] = color + rng.normal(0, 10, (int(mask.sum()), 3))
        gt[mask] = cls
    return np.clip(img, 0, 255).astype(np.uint8), gt


def _cues_from_gt(rng, gt: np.ndarray, cue_size: int, n_fg: int = 12, n_bg: int = 40):
    """Sparse (class, row, col) cue points on the score grid, seed-style:
    foreground points only well inside objects (the whole 8x stride cell is
    in-class), background points anywhere background."""
    stride = max(gt.shape[0] // cue_size, 1)
    small = gt[:: stride, :: stride][:cue_size, :cue_size]
    cs, rs, cols = [], [], []
    for cls in np.unique(small):
        ys, xs = np.nonzero(small == cls)
        if len(ys) == 0:
            continue
        take = n_bg if cls == 0 else n_fg
        sel = rng.choice(len(ys), size=min(take, len(ys)), replace=False)
        cs.extend([int(cls)] * len(sel))
        rs.extend(ys[sel].tolist())
        cols.extend(xs[sel].tolist())
    return np.asarray(cs), np.asarray(rs), np.asarray(cols)


def make_dataset(root: str, n_train: int, n_val: int, size: int, seed: int = 0):
    from dsrg_tpu.data.cues import save_cue_db
    from dsrg_tpu.utils.palette import write_png

    rng = np.random.default_rng(seed)
    os.makedirs(osp.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(osp.join(root, "SegmentationClass"), exist_ok=True)
    cue_size = (size - 1) // 8 + 1
    entries = {}
    train_ids, val_ids = [], []
    for i in range(n_train + n_val):
        img, gt = _make_image(rng, size, n_obj=int(rng.integers(1, 3)))
        img_id = f"synth_{i:05d}"
        Image.fromarray(img).save(osp.join(root, "JPEGImages", img_id + ".jpg"))
        write_png(gt, osp.join(root, "SegmentationClass", img_id + ".png"))
        if i < n_train:
            train_ids.append(img_id)
            c, r, col = _cues_from_gt(rng, gt, cue_size)
            fg = np.unique(c[c > 0]) if len(c) else np.asarray([], np.int64)
            entries[i] = (fg, (c, r, col))
        else:
            val_ids.append(img_id)
    save_cue_db(osp.join(root, "cues.pickle"), entries)
    with open(osp.join(root, "input_list.txt"), "w") as f:
        for i, img_id in enumerate(train_ids):
            f.write(f"{img_id}.jpg {i}\n")
    with open(osp.join(root, "train_aug_id.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(osp.join(root, "val_id.txt"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    return root


def _miou3(root: str, pred_dir: str) -> dict:
    """Honest 3-class IoU (bg, circle, square) over the val predictions.

    The reference's jaccard drops classes without a correct hit
    (utils/confusion.py:85-92 quirk) — an all-background predictor scores
    ~0.79 on background alone — so this is the actual learning signal."""
    from dsrg_tpu.utils.confusion import ConfusionMatrix
    from dsrg_tpu.utils.palette import read_mask_png

    conf = ConfusionMatrix(21)
    for img_id in open(osp.join(root, "val_id.txt")).read().split():
        gt = read_mask_png(osp.join(root, "SegmentationClass", img_id + ".png"))
        pred = read_mask_png(osp.join(pred_dir, img_id + ".png"))
        conf.add(gt, pred)
    m = conf.M
    with np.errstate(divide="ignore", invalid="ignore"):
        per = [
            float(np.nan_to_num(m[i, i] / (m[i].sum() + m[:, i].sum() - m[i, i])))
            for i in range(3)
        ]
    return {
        "iou_bg_circle_square": [round(v, 4) for v in per],
        "miou3": round(float(np.mean(per)), 4),
    }


def main(argv=None) -> float:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--size", type=int, default=321, help="image/crop size")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--sizes", type=int, nargs="+", default=None,
                   help="inference scale sizes (default: [size])")
    p.add_argument("--smooth", action="store_true", help="CRF at inference")
    p.add_argument("--batch", type=int, default=8, help="inference chunk")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--model-name", choices=["vgg16", "resnet101"], default="vgg16")
    p.add_argument("--crf-true-grad", action="store_true",
                   help="train with the true mean-field Jacobian (CRF-as-RNN)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--two-stage", action="store_true",
                   help="run the FULL run.sh-equivalent recipe (stage-s train "
                        "-> pseudo-GT dump -> stage-f retrain -> final "
                        "predictions -> evaluate) via run_recipe instead of "
                        "the single-stage loop")
    p.add_argument("--iters2", type=int, default=None,
                   help="stage-2 iterations (default: --iters)")
    args = p.parse_args(argv)

    root = osp.join(args.work_dir, "data")
    make_dataset(root, args.n_train, args.n_val, args.size, args.seed)

    if args.two_stage:
        from dsrg_tpu.tools import run_recipe

        w = osp.join(args.work_dir, "recipe")
        run_recipe.main([
            "--pascal-dir", root, "--list-dir", root,
            "--cues", osp.join(root, "cues.pickle"),
            "--work-dir", w,
            "--stage1-iters", str(args.iters),
            "--stage2-iters", str(args.iters2 or args.iters),
            "--dtype", args.dtype,
            "--batch-size", str(args.batch_size),
            "--crop-size", str(args.size),
            "--test-sizes", str(args.size),
            "--test-scales", "1.0",
            "--model", args.model_name,
        ] + ([] if args.smooth else ["--no-smooth"]))
        miou = float(
            open(osp.join(w, "DSRG_result_final.txt")).read().splitlines()[0].split()[1]
        )
        out = {"synthetic_val_miou_refquirk": miou, "two_stage": True,
               "iters": args.iters, **_miou3(root, osp.join(w, "DSRG_final_output"))}
        print(json.dumps(out))
        return out["miou3"]

    from dsrg_tpu.tools import evaluate as evaluate_tool
    from dsrg_tpu.tools import train as train_tool
    from dsrg_tpu.tools._infer_common import build_arg_parser, run_inference

    snap_dir = osp.join(args.work_dir, "models")
    train_tool.main([
        "--stage", "s",
        "--image-dir", osp.join(root, "JPEGImages"),
        "--input-list", osp.join(root, "input_list.txt"),
        "--cues", osp.join(root, "cues.pickle"),
        "--snapshot-dir", snap_dir,
        "--max-iter", str(args.iters),
        "--batch-size", str(args.batch_size),
        "--crop-size", str(args.size),
        "--snapshot-every", str(args.iters),
        "--display", "25",
        "--dtype", args.dtype,
        "--model", args.model_name,
    ] + (["--crf-true-grad"] if args.crf_true_grad else []))
    params_path = osp.join(snap_dir, f"step_{args.iters}_params")

    pred_dir = osp.join(args.work_dir, "preds")
    infer_argv = [
        "--images", osp.join(root, "val_id.txt"),
        "--dir", root,
        "--model", params_path,
        "--output", pred_dir,
        "--batch", str(args.batch),
        "--model-name", args.model_name,
    ] + (["--smooth"] if args.smooth else [])
    run_inference(
        build_arg_parser("").parse_args(infer_argv),
        sizes=args.sizes or [args.size],
    )

    result_path = osp.join(args.work_dir, "result.txt")
    evaluate_tool.main([
        "--pred", pred_dir,
        "--gt", osp.join(root, "SegmentationClass"),
        "--test_ids", osp.join(root, "val_id.txt"),
        "--save_path", result_path,
        "--class_num", "21",
    ])
    miou = float(open(result_path).read().splitlines()[0].split()[1])
    out = {"synthetic_val_miou_refquirk": miou, "iters": args.iters,
           **_miou3(root, pred_dir)}
    print(json.dumps(out))
    return out["miou3"]


if __name__ == "__main__":
    main()
