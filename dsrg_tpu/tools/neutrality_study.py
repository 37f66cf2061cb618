"""CRF-engine mIoU-neutrality study on photo-statistics inputs.

VOC data is unavailable in the build environment, so engine neutrality is
measured on synthetic *photo-like* inputs (piecewise-constant color regions
with smooth shading, texture noise, and CNN-like blurred/corrupted unaries)
at production geometry (500x375, 21 classes, 10 iterations, inference
parameterization sf=1.0).  The oracle is the native permutohedral CPU engine
— the SAME splat/blur/slice algorithm as the reference's host engine
(``CRF/src/permutohedral.cpp``) — so "agreement with oracle" reads directly
as "agreement with the reference pipeline's CRF".

Also measures the train-geometry ``crf_fast`` question (ADVICE r1): bf16 vs
fp32 exact-engine mean field at 41^2 x 21 and its effect on the GROWN SEEDS
(the only consumer of the train CRF), batch-averaged.

Run: ``python -m dsrg_tpu.tools.neutrality_study [--images N] [--size H W]``
Numbers from this tool are recorded in STATUS.md.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_photo_like(rng, h, w, n_regions=8, n_classes=21):
    """Piecewise-constant regions + smooth shading + noise, and CNN-ish unaries."""
    from scipy.ndimage import gaussian_filter, zoom

    # voronoi regions
    seeds = rng.uniform(0, 1, size=(n_regions, 2)) * [h, w]
    ys, xs = np.mgrid[0:h, 0:w]
    d = (ys[None] - seeds[:, 0, None, None]) ** 2 + (xs[None] - seeds[:, 1, None, None]) ** 2
    region = np.argmin(d, axis=0)
    region_colors = rng.uniform(30, 225, size=(n_regions, 3)).astype(np.float32)
    img = region_colors[region]
    # smooth shading field
    low = rng.uniform(-30, 30, size=(6, 8, 3)).astype(np.float32)
    shade = zoom(low, (h / 6, w / 8, 1), order=1)[:h, :w]
    img = np.clip(img + shade + rng.normal(size=img.shape) * 6, 0, 255).astype(np.float32)

    # CNN-like unaries: region class + blur + corruption
    cls_of_region = rng.integers(0, n_classes, size=n_regions)
    label = cls_of_region[region]
    logits = np.zeros((h, w, n_classes), np.float32)
    logits[ys, xs, label] = 3.0
    logits = gaussian_filter(logits, sigma=(8, 8, 0))
    logits += rng.normal(size=logits.shape).astype(np.float32) * 0.4
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    return img, np.maximum(probs, 1e-5), label


def engine_neutrality(n_images=3, h=375, w=500, m=21, seed=0):
    import jax
    import jax.numpy as jnp

    from dsrg_tpu import native
    from dsrg_tpu.ops.crf.grid import mean_field_grid
    from dsrg_tpu.ops.crf.lattice import mean_field_lattice
    from dsrg_tpu.ops.crf.mmgrid import mean_field_mmgrid

    if not (native.available() or native.build()):
        raise RuntimeError("native permutohedral oracle unavailable")

    engines = {
        "mmgrid": lambda im, u: np.asarray(
            jax.jit(lambda a, b: mean_field_mmgrid(b, a, n_iters=10))(im, u)
        ),
        "lattice": lambda im, u: np.asarray(
            jax.jit(lambda a, b: mean_field_lattice(b, a, n_iters=10))(im, u)
        ),
        "grid": lambda im, u: np.asarray(
            jax.jit(lambda a, b: mean_field_grid(b, a, n_iters=10))(im, u)
        ),
    }

    rng = np.random.default_rng(seed)
    rows = {k: {"agree": [], "mad": [], "ms": []} for k in engines}
    oracle_ms = []
    for i in range(n_images):
        img, probs, _ = make_photo_like(rng, h, w)
        unary = np.log(probs)
        t0 = time.perf_counter()
        q_ref = native.crf_permutohedral(img, unary, maxiter=10, scale_factor=1.0)
        oracle_ms.append((time.perf_counter() - t0) * 1000)
        a_ref = q_ref.argmax(-1)
        for name, fn in engines.items():
            t0 = time.perf_counter()
            q = fn(jnp.asarray(img), jnp.asarray(unary))
            dt = (time.perf_counter() - t0) * 1000
            rows[name]["agree"].append(float((q.argmax(-1) == a_ref).mean()))
            rows[name]["mad"].append(float(np.abs(q - q_ref).mean()))
            rows[name]["ms"].append(dt)
    out = {
        "geometry": f"{h}x{w}x{m}, 10 iters, sf=1.0",
        "oracle": "native permutohedral (reference algorithm), "
        f"{np.mean(oracle_ms):.0f} ms/image host",
        "n_images": n_images,
    }
    for name, r in rows.items():
        out[name] = {
            "argmax_agreement_vs_reference_algo": round(float(np.mean(r["agree"])), 5),
            "mean_abs_marginal_diff": round(float(np.mean(r["mad"])), 6),
            "wall_ms_per_image_incl_compile_first": [round(x, 1) for x in r["ms"]],
        }
    return out


def crf_fast_neutrality(n_batches=4, batch=8, h=41, m=21, seed=0):
    """bf16 vs fp32 train-geometry CRF: effect on the grown seeds."""
    import jax
    import jax.numpy as jnp

    from dsrg_tpu.ops.crf.api import crf_refine_probs
    from dsrg_tpu.ops.grow import dsrg_grow

    rng = np.random.default_rng(seed)
    diffs, seed_mismatch = [], []
    for _ in range(n_batches):
        imgs, probs, labels_l = [], [], []
        for _ in range(batch):
            img, p, label = make_photo_like(rng, h, h, n_regions=4, n_classes=m)
            imgs.append(img)
            probs.append(p)
            lab = np.zeros(m, np.float32)
            lab[np.unique(label)] = 1.0
            lab[0] = 1.0
            labels_l.append(lab)
        imgs = jnp.asarray(np.stack(imgs) - 127.0)  # mean-subtracted-ish guide
        probs = jnp.asarray(np.stack(probs))
        labels = np.stack(labels_l)
        cues = (rng.uniform(size=(batch, h, h, m)) < 0.02).astype(np.float32)
        cues *= labels[:, None, None, :]

        q32 = crf_refine_probs(probs, imgs, fast=False)
        q16 = crf_refine_probs(probs, imgs, fast=True)
        diffs.append(float(jnp.abs(q32 - q16).mean()))
        g32 = np.asarray(dsrg_grow(jnp.asarray(labels), jnp.asarray(cues), q32))
        g16 = np.asarray(dsrg_grow(jnp.asarray(labels), jnp.asarray(cues), q16))
        seed_mismatch.append(float((g32 != g16).mean()))
    return {
        "geometry": f"batch {batch} @ {h}x{h}x{m}, sf=12, 10 iters",
        "n_batches": n_batches,
        "mean_abs_marginal_diff_bf16_vs_fp32": round(float(np.mean(diffs)), 6),
        "grown_seed_disagreement_rate": round(float(np.mean(seed_mismatch)), 6),
    }


def pipeline_neutrality(
    model_path: str,
    n_images: int = 12,
    h: int = 375,
    w: int = 500,
    scales=(0.75, 1.0, 1.25),
    smooth: bool = True,
    model_name: str = "vgg16",
    seed: int = 0,
):
    """Scales-mode device pipeline vs the serial host pipeline (VERDICT r2
    item 5 / r3 item 5): mask agreement on photo-statistics inputs at
    production sizes with a TRAINED model (pass a real checkpoint — random
    weights make the argmax noise-dominated and the comparison meaningless).

    The device path runs each fractional scale on a static ceil(s*canvas)
    forward canvas; since round 4 the valid-extent masking happens INSIDE
    the net before every spatial op (``models/masking.py``), making the
    canvas forward exact vs the per-shape host forward — the round-3 border
    perturbation (0.9928 mean agreement) is gone by construction.  The host
    leg here is the reference-exact serial per-image pipeline
    (``test-ms-f.py:115-130``); residual disagreement is fp-reassociation
    noise between scipy's zoom and the on-device matmul interpolation at
    near-tied argmaxes.
    """
    from dsrg_tpu.data.synth import PROFILES, make_image
    from dsrg_tpu.tools._infer_common import load_predictor

    import dataclasses

    predictor = load_predictor(model_path, 21, model_name)
    rng = np.random.default_rng(seed)
    spec = dataclasses.replace(
        PROFILES["voc"], size_min=min(h, w), size_max=max(h, w)
    )
    imgs = []
    for i in range(n_images):
        if i % 2 == 0:
            img, _ = make_image(rng, spec)  # model's native statistics
        else:
            img, _, _ = make_photo_like(rng, h, w)
            img = np.clip(img, 0, 255).astype(np.uint8)
        imgs.append(img)

    agree, host_ms, dev_ms = [], [], []
    t0 = time.perf_counter()
    dev_masks = predictor.predict_masks_device(
        imgs, scales=list(scales), smooth=smooth
    )
    dev_ms.append((time.perf_counter() - t0) * 1000 / len(imgs))
    for img, dm in zip(imgs, dev_masks):
        t0 = time.perf_counter()
        hm = predictor.predict_mask(img, scales=list(scales), smooth=smooth)
        host_ms.append((time.perf_counter() - t0) * 1000)
        agree.append(float((hm == dm).mean()))
    return {
        "geometry": f"{n_images} images ~{h}x{w}, scales {list(scales)}, "
        f"smooth={smooth}",
        "mask_agreement_mean": round(float(np.mean(agree)), 6),
        "mask_agreement_min": round(float(np.min(agree)), 6),
        "per_image_agreement": [round(a, 5) for a in agree],
        "host_serial_ms_per_image": round(float(np.mean(host_ms)), 1),
        "device_pipeline_ms_per_image_incl_compile": round(float(np.mean(dev_ms)), 1),
    }


def pipeline_miou_study(
    model_path: str,
    data_root: str,
    work_dir: str,
    scales=(0.75, 1.0, 1.25),
    smooth: bool = True,
    model_name: str = "vgg16",
    batch: int = 8,
    num_classes: int = 21,
    bucket: int = 64,
    canvas_bucket: int = 512,
):
    """Device-vs-host final-eval mIoU on a val set with ground truth
    (VERDICT r3 item 5): run the test-ms-f workload over ``data_root``'s
    ``val_id.txt`` once per pipeline, evaluate both prediction sets against
    ``SegmentationClass``, and report the two mIoUs, their delta, and the
    per-image mask agreement.

    ``data_root`` is a synth_check-layout dataset root (JPEGImages/,
    SegmentationClass/, val_id.txt) — pass the probe-training dataset so the
    checkpoint's statistics match the images.  The host leg is the recipe's
    default batched host path (``--pipeline host``), the device leg the
    whole-pipeline device program (``--pipeline device``); both now run the
    SAME exact masked-canvas forward (``models/masking.py``), so the delta
    isolates the remaining CRF-canvas + fp differences.
    """
    import os.path as osp

    from PIL import Image

    from dsrg_tpu.tools import evaluate as evaluate_tool
    from dsrg_tpu.tools._infer_common import build_arg_parser, run_inference

    ids_file = osp.join(data_root, "val_id.txt")
    out = {
        "geometry": f"scales {list(scales)}, smooth={smooth}, batch {batch}",
        "val_ids": ids_file,
    }
    pred_dirs = {}
    for pipeline in ("host", "device"):
        pred_dir = osp.join(work_dir, f"preds_{pipeline}")
        argv = [
            "--images", ids_file, "--dir", data_root, "--model", model_path,
            "--output", pred_dir, "--batch", str(batch),
            "--model-name", model_name, "--pipeline", pipeline,
            "--num-classes", str(num_classes),
            # bucketed forwards are EXACT with the masked canvas (tested in
            # test_masked_forward.py) and bound the remote-compile count on
            # variable-size val sets to a handful of shapes per pipeline
            "--bucket", str(bucket), "--canvas-bucket", str(canvas_bucket),
        ] + (["--smooth"] if smooth else [])
        t0 = time.perf_counter()
        run_inference(build_arg_parser("").parse_args(argv), scales=list(scales))
        wall = time.perf_counter() - t0
        result_path = osp.join(work_dir, f"result_{pipeline}.txt")
        miou = evaluate_tool.main([
            "--pred", pred_dir, "--gt", osp.join(data_root, "SegmentationClass"),
            "--test_ids", ids_file, "--save_path", result_path,
            "--class_num", str(num_classes),
        ])
        out[f"miou_{pipeline}"] = round(miou, 5)
        # honest variant: mean over bg + fg classes PRESENT in the val gt
        # (the reference evaluator averages 0/0=nan classes on small sets)
        from dsrg_tpu.tools.synth_check import _miou_fg

        out[f"miou_honest_{pipeline}"] = _miou_fg(
            data_root, pred_dir, n_classes=num_classes
        )["miou3"]
        out[f"wall_s_{pipeline}"] = round(wall, 1)
        pred_dirs[pipeline] = pred_dir

    ids = [ln.strip() for ln in open(ids_file) if ln.strip()]
    agree = [
        float(
            np.mean(
                np.asarray(Image.open(osp.join(pred_dirs["host"], i + ".png")))
                == np.asarray(Image.open(osp.join(pred_dirs["device"], i + ".png")))
            )
        )
        for i in ids
    ]
    out["miou_delta_device_minus_host"] = round(
        out["miou_device"] - out["miou_host"], 5
    )
    out["miou_honest_delta_device_minus_host"] = round(
        out["miou_honest_device"] - out["miou_honest_host"], 5
    )
    out["mask_agreement_mean"] = round(float(np.mean(agree)), 6)
    out["mask_agreement_min"] = round(float(np.min(agree)), 6)
    out["n_val"] = len(ids)
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=int, default=3)
    p.add_argument("--size", type=int, nargs=2, default=[375, 500])
    p.add_argument("--skip-fast", action="store_true")
    p.add_argument("--pipeline-study", action="store_true",
                   help="scales-mode device-vs-host pipeline mask agreement "
                        "(requires --model)")
    p.add_argument("--miou-study", action="store_true",
                   help="device-vs-host final-eval mIoU delta on a val set "
                        "with GT (requires --model and --data-root)")
    p.add_argument("--model", default=None, help="trained params checkpoint")
    p.add_argument("--data-root", default=None,
                   help="synth_check-layout dataset root for --miou-study")
    p.add_argument("--work-dir", default="/tmp/pipe_miou",
                   help="prediction/result output dir for --miou-study")
    p.add_argument("--no-smooth", action="store_true",
                   help="--miou-study: skip the CRF smoothing pass")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--model-name", default="vgg16",
                   choices=["vgg16", "resnet101"])
    p.add_argument("--scales", type=float, nargs="+", default=[0.75, 1.0, 1.25])
    args = p.parse_args(argv)

    if args.miou_study:
        if not (args.model and args.data_root):
            p.error("--miou-study requires --model and --data-root")
        import os

        os.makedirs(args.work_dir, exist_ok=True)
        report = {
            "pipeline_miou": pipeline_miou_study(
                args.model, args.data_root, args.work_dir,
                scales=args.scales, smooth=not args.no_smooth,
                model_name=args.model_name, batch=args.batch,
            )
        }
        print(json.dumps(report, indent=2))
        return

    if args.pipeline_study:
        if not args.model:
            p.error("--pipeline-study requires --model")
        report = {
            "pipeline": pipeline_neutrality(
                args.model, max(args.images, 4), *args.size,
                scales=args.scales, model_name=args.model_name,
            )
        }
        print(json.dumps(report, indent=2))
        return

    report = {"engines": engine_neutrality(args.images, *args.size)}
    if not args.skip_fast:
        report["crf_fast"] = crf_fast_neutrality()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
