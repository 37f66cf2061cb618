"""End-to-end CLI pipeline test on a tiny synthetic VOC tree:
stage-s training -> inference -> evaluation, exercising checkpoints too."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db


@pytest.fixture
def tiny_voc(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.default_rng(0)
    ids, entries = [], {}
    for i in range(4):
        img_id = f"2007_{i:06d}"
        ids.append(img_id)
        arr = rng.integers(0, 255, (45, 55, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
        mask = rng.integers(0, 21, (45, 55)).astype(np.uint8)
        Image.fromarray(mask).save(root / "SegmentationClass" / f"{img_id}.png")
        entries[i] = (
            np.array([2]),
            (rng.integers(0, 3, 4) * 2, rng.integers(0, 6, 4), rng.integers(0, 6, 4)),
        )
    save_cue_db(str(root / "cues.pickle"), entries)
    with open(root / "input_list.txt", "w") as f:
        for i, img_id in enumerate(ids):
            f.write(f"{img_id}.jpg {i}\n")
    with open(root / "val_id.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    return root, ids


@pytest.mark.slow
def test_train_infer_evaluate_pipeline(tiny_voc, tmp_path):
    root, ids = tiny_voc
    from dsrg_tpu.tools import train as train_tool

    snap_dir = str(tmp_path / "models")
    train_tool.main([
        "--stage", "s",
        "--image-dir", str(root / "JPEGImages"),
        "--input-list", str(root / "input_list.txt"),
        "--cues", str(root / "cues.pickle"),
        "--snapshot-dir", snap_dir,
        "--max-iter", "2", "--batch-size", "2", "--crop-size", "41",
        "--snapshot-every", "2", "--display", "1", "--no-mesh",
    ])
    params_path = osp.join(snap_dir, "step_2_params")
    assert osp.exists(params_path)

    # resume from snapshot: runs iterations 2..3
    train_tool.main([
        "--stage", "s",
        "--image-dir", str(root / "JPEGImages"),
        "--input-list", str(root / "input_list.txt"),
        "--cues", str(root / "cues.pickle"),
        "--snapshot", osp.join(snap_dir, "step_2"),
        "--snapshot-dir", snap_dir,
        "--max-iter", "3", "--batch-size", "2", "--crop-size", "41",
        "--snapshot-every", "3", "--display", "1", "--no-mesh",
    ])
    assert osp.exists(osp.join(snap_dir, "step_3_params"))

    # inference CLI (single small scale to keep CPU time down)
    from dsrg_tpu.tools._infer_common import build_arg_parser, run_inference

    out_dir = str(tmp_path / "preds")
    args = build_arg_parser("").parse_args([
        "--images", str(root / "val_id.txt"),
        "--dir", str(root),
        "--model", params_path,
        "--output", out_dir,
    ])
    run_inference(args, sizes=[41])
    for img_id in ids:
        assert osp.exists(osp.join(out_dir, img_id + ".png"))
    mask = np.asarray(Image.open(osp.join(out_dir, ids[0] + ".png")))
    assert mask.shape == (45, 55)
    assert mask.max() < 21

    # evaluation CLI
    from dsrg_tpu.tools import evaluate as evaluate_tool

    save_path = str(tmp_path / "result.txt")
    evaluate_tool.main([
        "--pred", out_dir,
        "--gt", str(root / "SegmentationClass"),
        "--test_ids", str(root / "val_id.txt"),
        "--save_path", save_path,
        "--class_num", "21",
    ])
    content = open(save_path).read()
    assert content.startswith("meanIOU: ")
    miou = float(content.splitlines()[0].split()[1])
    assert 0.0 <= miou <= 1.0


def test_infer_cli_device_pipeline_scales(tiny_voc, tmp_path):
    """test-ms-f's fractional-scales mode through the device-resident
    streaming pipeline (--pipeline device --batch 2)."""
    import jax
    import jax.numpy as jnp

    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.tools._infer_common import build_arg_parser, run_inference
    from dsrg_tpu.train.checkpoint import save_params

    root, ids = tiny_voc
    model = DeepLabLargeFOV(num_classes=21)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    params_path = str(tmp_path / "rand_params")
    save_params(params_path, params)

    out_dir = str(tmp_path / "preds_dev")
    args = build_arg_parser("").parse_args([
        "--images", str(root / "val_id.txt"),
        "--dir", str(root),
        "--model", params_path,
        "--output", out_dir,
        "--batch", "2",
        "--pipeline", "device",
    ])
    run_inference(args, scales=[0.75, 1.0])
    for img_id in ids:
        mask = np.asarray(Image.open(osp.join(out_dir, img_id + ".png")))
        assert mask.shape == (45, 55)
        assert mask.max() < 21


@pytest.mark.slow
def test_synth_check_smoke(tmp_path):
    """The synthetic learning-sanity tool runs the full generate -> train ->
    infer -> evaluate loop end-to-end (learning itself is asserted in the
    real-TPU run recorded in STATUS.md, not in this 4-iteration smoke)."""
    from dsrg_tpu.tools import synth_check

    miou3 = synth_check.main([
        "--work-dir", str(tmp_path / "synth"),
        "--iters", "2", "--n-train", "6", "--n-val", "3",
        "--size", "41", "--batch-size", "2", "--batch", "2",
    ])
    assert np.isfinite(miou3) and 0.0 <= miou3 <= 1.0


@pytest.mark.slow
def test_synth_check_two_stage_smoke(tmp_path):
    """--two-stage drives the full run.sh-equivalent recipe (stage-s ->
    pseudo-GT dump -> stage-f -> final predictions -> evaluate) through
    run_recipe on the synthetic tree."""
    from dsrg_tpu.tools import synth_check

    miou3 = synth_check.main([
        "--work-dir", str(tmp_path / "synth2"),
        "--iters", "2", "--n-train", "6", "--n-val", "3",
        "--size", "41", "--batch-size", "2", "--batch", "2",
        "--two-stage", "--in-process",
    ])
    assert np.isfinite(miou3) and 0.0 <= miou3 <= 1.0


def test_all_tools_accept_argv_and_help():
    """Every CLI tool exposes main(argv) and a working --help (embeddability
    + flag-surface smoke across the whole reference tool mirror)."""
    import importlib

    tools = [
        "train", "test", "test_ms", "test_ms_f", "test_coco", "test_coco_f",
        "evaluate", "ap", "dump_cues", "generate_train_gt", "show_result",
        "run_recipe", "export", "synth_check",
    ]
    for name in tools:
        mod = importlib.import_module(f"dsrg_tpu.tools.{name}")
        try:
            mod.main(["--help"])
        except SystemExit as e:
            assert e.code == 0, (name, e.code)


def test_resolve_pipeline_contract():
    """Shared CLI dispatch: contradictory --pipeline device + non-mmgrid
    --smooth engine errors instead of silently downgrading; non-mmgrid
    engines force serial only under --smooth; the device pipeline honors an
    explicit request even at --batch 1."""
    import pytest as _pytest

    from dsrg_tpu.tools._infer_common import build_arg_parser, resolve_pipeline

    def parse(extra):
        return build_arg_parser("").parse_args(
            ["--images", "x", "--dir", "y", "--model", "z"] + extra
        )

    with _pytest.raises(SystemExit):
        resolve_pipeline(parse(["--smooth", "--engine", "exact",
                                "--pipeline", "device"]), [41], None)

    _, chunk, _, dev = resolve_pipeline(
        parse(["--smooth", "--engine", "exact", "--batch", "8"]), [41], None)
    assert chunk == 1 and not dev

    _, chunk, _, dev = resolve_pipeline(
        parse(["--engine", "exact", "--batch", "8"]), [41], None)
    assert chunk == 8 and dev  # engine only matters under --smooth

    _, _, _, dev = resolve_pipeline(
        parse(["--batch", "1", "--pipeline", "device"]), None, [1.0])
    assert dev  # explicit device honored even serial

    # fractional scales under auto: device when the model's canvas forward
    # is exact (valid_hw backbones), host fallback otherwise
    _, _, _, dev = resolve_pipeline(
        parse(["--batch", "8"]), None, [0.75], exact_canvas=True)
    assert dev
    _, _, _, dev = resolve_pipeline(
        parse(["--batch", "8"]), None, [0.75], exact_canvas=False)
    assert not dev
    _, _, _, dev = resolve_pipeline(
        parse(["--batch", "8", "--pipeline", "host"]), None, [0.75],
        exact_canvas=True)
    assert not dev  # explicit host always honored


def test_predict_masks_device_requires_one_mode():
    import pytest as _pytest

    from dsrg_tpu.inference import Predictor
    from dsrg_tpu.models import DeepLabLargeFOV
    import jax
    import jax.numpy as jnp

    model = DeepLabLargeFOV(num_classes=6, head_dilations=(2, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    p = Predictor(model, params, num_classes=6)
    img = np.zeros((40, 40, 3), np.uint8)
    with _pytest.raises(ValueError):
        p.predict_masks_device([img])
    with _pytest.raises(ValueError):
        p.predict_masks_device([img], sizes=[41], scales=[1.0])


def test_preview_mask_headless_noop():
    """Reference parity: test tools without --output show an interactive
    (image | mask) figure (test-ms.py:130-139).  Headless (Agg) must be a
    silent no-op so scripted runs without a display continue."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from dsrg_tpu.tools._infer_common import preview_mask

    preview_mask(
        np.zeros((20, 30, 3), np.uint8),
        np.zeros((20, 30), np.uint8),
        num_classes=21,
    )
