"""Dump localization cues — optionally after on-device DSRG growing — as
``<id>_cue.png`` masks for seed-quality evaluation with ``tools/ap.py``.

The reference measures seed quality on such pngs (``ap.py:152``) but ships no
generator; this closes the loop: raw pickle cues (``--grow`` off) or grown
cues from a model's refined probabilities (``--grow`` on, the DSRGLayer
pipeline at inference time).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image

from dsrg_tpu.data.cues import CueDB
from dsrg_tpu.utils.palette import write_png


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", dest="image_list", required=True,
                   help="input_list.txt ('file.jpg id' rows)")
    p.add_argument("--dir", dest="data_dir", required=True, help="VOC root")
    p.add_argument("--cues", required=True, help="localization cue pickle")
    p.add_argument("--output", dest="output_dir", required=True)
    p.add_argument("--num-classes", default=21, type=int)
    p.add_argument("--grow", action="store_true",
                   help="run CRF refinement + DSRG growing with --model first")
    p.add_argument("--model", default=None, help="params checkpoint (with --grow)")
    p.add_argument("--th1", default=0.99, type=float)
    p.add_argument("--th2", default=0.85, type=float)
    p.add_argument("--skip-existing", action="store_true",
                   help="skip ids whose _cue.png already exists (resume an "
                        "interrupted dump)")
    p.add_argument("--rss-limit-gb", type=float, default=-1.0,
                   help="host-RSS watchdog: past this many GB, exit 75 so a "
                        "supervisor can relaunch with --skip-existing (the "
                        "--grow path ships per-image tensors through leaky "
                        "remote-TPU tunnel clients).  -1 = auto (80%% of "
                        "MemTotal), 0 = off")
    p.add_argument("--stall-limit-min", type=float, default=60.0,
                   help="stall watchdog: exit 75 when no image completes "
                        "for this many minutes (wedged device/tunnel).  "
                        "0 = off")
    return p.parse_args(argv)


def cues_to_mask(cues: np.ndarray, ignore: int = 255) -> np.ndarray:
    """(h, w, M) cue volume -> (h, w) label mask; unseeded pixels = ignore."""
    has = cues.sum(-1) > 0
    lab = cues.argmax(-1).astype(np.uint8)
    lab[~has] = ignore
    return lab


def main(argv=None) -> None:
    args = parse_args(argv)
    cue_db = CueDB(args.cues, num_classes=args.num_classes)
    rows = [ln.strip().split() for ln in open(args.image_list) if ln.strip()]
    if not osp.isdir(args.output_dir):
        os.makedirs(args.output_dir)
    from dsrg_tpu.utils import watchdog

    if args.skip_existing:
        _, rows = watchdog.split_existing(
            rows,
            lambda r: osp.join(args.output_dir,
                               osp.splitext(osp.basename(r[0]))[0] + "_cue.png"),
        )
    # --output is required here, so persistence always holds
    rss_limit, stall = watchdog.arm(args, persist=True, describe="image")

    predictor = None
    refine_grow = None
    if args.grow:
        import jax

        from dsrg_tpu.ops.crf import crf_refine_probs
        from dsrg_tpu.ops.grow import dsrg_grow
        from dsrg_tpu.ops.softmax import floored_softmax
        from dsrg_tpu.tools._infer_common import load_predictor

        predictor = load_predictor(args.model, args.num_classes)

        # ONE jitted program for softmax -> CRF refine -> region grow: the
        # library fns contain fori/while loops and must not run eagerly
        # (op-by-op dispatch through a remote tunnel is thousands of round
        # trips per image; dsrg_grow also must be jitted by the CALLER —
        # see CLAUDE.md on nested pjit)
        @jax.jit
        def refine_grow(labels, cues, scores, img):
            probs = floored_softmax(scores)
            q = crf_refine_probs(probs, img)
            return dsrg_grow(labels, cues, q, th1=args.th1, th2=args.th2)

    for index, (fname, image_id) in enumerate(rows):
        if index % 100 == 0:
            print("%d processed" % index, flush=True)
            watchdog.maybe_restart(rss_limit, index, len(rows))
        img_id = osp.splitext(osp.basename(fname))[0]
        labels, cues = cue_db.get(int(image_id))
        if args.grow:
            from dsrg_tpu.data.voc import load_image_bgr, preprocess_image

            img = load_image_bgr(osp.join(args.data_dir, "JPEGImages", img_id + ".jpg"))
            img = preprocess_image(img, 321)
            scores = predictor.scores_at_size(img)
            cues = np.asarray(
                refine_grow(labels[None], cues[None], scores[None],
                            img[None].astype(np.float32))
            )[0]
        write_png(cues_to_mask(cues), osp.join(args.output_dir, img_id + "_cue.png"))
        stall.tick()
    stall.close()


if __name__ == "__main__":
    main()
