"""BN-statistics calibration -> a warm-start ``.caffemodel`` for ResNet-101.

The reference NEVER trains its ResNet variant from scratch: Caffe-DeepLab
freezes BatchNorm statistics and scale/shift (lr_mult 0) and always
warm-starts from a pretrained caffemodel whose stats make every layer
well-conditioned.  Without such stats a frozen-BN ResNet cannot learn (the
round-3 from-scratch probe measured mIoU 0.001 — the documented contract,
not a bug).

This tool synthesizes the missing piece of that contract from data alone:
run N forward batches in train-BN mode (normalize by batch statistics,
accumulate running averages — "precise BN" calibration), then export
params + calibrated stats through ``models/export_caffe`` as a real
DeepLab-v2-named ``.caffemodel``.  Training then consumes it through the
SAME ``--weights *.caffemodel`` import path a downloaded pretrained model
uses (``tools/train.py`` / ``import_caffe.resnet_blobs_to_flax``).

Usage (on the synth_check dataset tree):
    python -m dsrg_tpu.tools.calibrate_bn \
        --image-dir data/JPEGImages --input-list data/input_list.txt \
        --cues data/cues.pickle --out resnet_calib.caffemodel
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--image-dir", required=True)
    p.add_argument("--input-list", required=True)
    p.add_argument("--cues", required=True, help="cue pickle (images only are used)")
    p.add_argument("--out", required=True, help="output .caffemodel path")
    p.add_argument("--batches", type=int, default=50,
                   help="calibration forward batches (momentum 0.95: 50 "
                        "batches leave <8%% weight on the identity init)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop-size", type=int, default=321)
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--head-logit-std", type=float, default=0.5,
                   help="rescale the classifier head kernels so the frozen-BN "
                        "score maps have this std on calibration data (0 = "
                        "keep the random init).  A random-weight ResNet-101's "
                        "residual stream RMS grows ~sqrt(depth); unscaled "
                        "3x3x2048 heads then emit |logit| ~ 15 maps whose "
                        "floored softmax saturates and whose 10x-lr head "
                        "gradients blow up the first SGD steps.  Scores are "
                        "linear in the head kernels, so this rescale is exact.")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> str:
    args = parse_args(argv)
    from dsrg_tpu.data.cues import CueDB
    from dsrg_tpu.data.voc import Stage1Dataset
    from dsrg_tpu.models import ResNet101DeepLab
    from dsrg_tpu.models.export_caffe import (
        resnet_variables_to_blobs,
        write_caffemodel,
    )
    from dsrg_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    cue_size = (args.crop_size - 1) // 8 + 1
    cue_db = CueDB(args.cues, num_classes=args.num_classes, cue_size=cue_size)
    dataset = Stage1Dataset(
        args.image_dir, args.input_list, cue_db,
        crop_size=args.crop_size, batch_size=args.batch_size, seed=args.seed,
    )

    model = ResNet101DeepLab(num_classes=args.num_classes)
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, args.crop_size, args.crop_size, 3)), train=False,
    )
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def calib_step(params, stats, images):
        _, mut = model.apply(
            {"params": params, "batch_stats": stats},
            images, train=False, train_bn=True, mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    it = iter(dataset)
    images = None
    for i in range(args.batches):
        batch = next(it)
        images = jnp.asarray(batch["images"], jnp.float32)
        stats = calib_step(params, stats, images)
        if (i + 1) % 10 == 0:
            print(f"calibrated {i + 1}/{args.batches} batches", flush=True)

    if args.head_logit_std > 0:
        # measure the score std under the exact training condition (frozen
        # calibrated BN) and rescale the head kernels to the target
        @jax.jit
        def score_std(params, stats, images):
            s = model.apply({"params": params, "batch_stats": stats},
                            images, train=False)
            return jnp.std(s)

        std0 = float(score_std(params, stats, images))
        scale = args.head_logit_std / max(std0, 1e-6)
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p * scale
            if any(str(getattr(k, "key", k)).startswith(("fc1_voc12", "fc8"))
                   for k in path)
            else p,
            params,
        )
        std1 = float(score_std(params, stats, images))
        print(f"head rescale: score std {std0:.3f} -> {std1:.3f} "
              f"(kernel scale {scale:.4g})", flush=True)

    stats = jax.device_get(stats)

    # sanity: calibration must have moved the stats off the identity init
    v0 = float(np.mean(np.abs(np.asarray(stats["bn1"]["mean"]))))
    assert v0 > 0, "bn1 running mean did not move — calibration failed"

    blobs = resnet_variables_to_blobs({"params": params, "batch_stats": stats})
    write_caffemodel(args.out, blobs)
    print(f"wrote {args.out}: {len(blobs)} layers, bn1 |mean|={v0:.4f}")
    return args.out


if __name__ == "__main__":
    main()
