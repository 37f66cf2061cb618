"""COCO inference CLI e2e on a synthetic tree (stage-s COCO training too)."""

import os.path as osp

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def coco_tree(tmp_path):
    root = tmp_path
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        img = rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i}.jpg")
        lbl = rng.integers(0, 6, (50, 60)).astype(np.uint8)
        Image.fromarray(lbl).save(root / "labels" / f"{i}.png")
        rows.append(f"images/{i}.jpg labels/{i}.png")
    (root / "list.txt").write_text("\n".join(rows) + "\n")
    (root / "pair_list.txt").write_text(
        "\n".join("/" + r.replace(" ", " /") for r in rows) + "\n"
    )
    return root


@pytest.mark.slow
def test_coco_stage_s_training_and_eval_cli(coco_tree, tmp_path):
    from dsrg_tpu.tools import train as train_tool

    snap = str(tmp_path / "m")
    train_tool.main([
        "--stage", "s", "--dataset", "coco",
        "--root", str(coco_tree) + "/", "--pair-list", str(coco_tree / "pair_list.txt"),
        "--snapshot-dir", snap, "--num-classes", "6",
        "--max-iter", "1", "--batch-size", "2", "--crop-size", "40",
        "--snapshot-every", "1", "--display", "1", "--no-mesh",
    ])
    params = osp.join(snap, "step_1_params")
    assert osp.exists(params)

    from dsrg_tpu.tools.test_coco import run_coco
    from dsrg_tpu.tools._infer_common import build_arg_parser

    p = build_arg_parser("")
    args = p.parse_args([
        "--images", str(coco_tree / "list.txt"), "--dir", str(coco_tree),
        "--model", params, "--output", str(tmp_path / "preds"), "--num-classes", "6",
    ])
    miou = run_coco(args, sizes=[40])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
    assert osp.exists(osp.join(str(tmp_path / "preds"), "0.png"))

    # batched device-resident pipeline (--batch 2): same tree, streaming mIoU
    args = p.parse_args([
        "--images", str(coco_tree / "list.txt"), "--dir", str(coco_tree),
        "--model", params, "--output", str(tmp_path / "preds_dev"),
        "--num-classes", "6", "--batch", "2",
    ])
    miou_dev = run_coco(args, sizes=[41])
    assert np.isfinite(miou_dev) and 0.0 <= miou_dev <= 1.0
    for i in range(3):
        assert osp.exists(osp.join(str(tmp_path / "preds_dev"), f"{i}.png"))

    # --skip-existing resume: a relaunch over a complete dump rewrites
    # nothing AND reproduces the identical final mIoU — skipped masks are
    # folded back into the confusion from disk, so a watchdog-interrupted
    # dump resumed mid-way still reports the full-dataset number
    mtimes = {i: osp.getmtime(osp.join(str(tmp_path / "preds_dev"), f"{i}.png"))
              for i in range(3)}
    args = p.parse_args([
        "--images", str(coco_tree / "list.txt"), "--dir", str(coco_tree),
        "--model", params, "--output", str(tmp_path / "preds_dev"),
        "--num-classes", "6", "--batch", "2", "--skip-existing",
    ])
    miou_resumed = run_coco(args, sizes=[41])
    assert miou_resumed == pytest.approx(miou_dev, abs=1e-12)
    for i, t in mtimes.items():
        assert osp.getmtime(
            osp.join(str(tmp_path / "preds_dev"), f"{i}.png")) == t


def test_coco_f_device_pipeline_scales(coco_tree, tmp_path):
    """test-coco-f's scales mode through the streaming device pipeline
    (--pipeline device --batch 2) with running mIoU."""
    import jax
    import jax.numpy as jnp

    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.tools._infer_common import build_arg_parser
    from dsrg_tpu.tools.test_coco import run_coco
    from dsrg_tpu.train.checkpoint import save_params

    model = DeepLabLargeFOV(num_classes=6)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    params_path = str(tmp_path / "rp")
    save_params(params_path, params)

    args = build_arg_parser("").parse_args([
        "--images", str(coco_tree / "list.txt"), "--dir", str(coco_tree),
        "--model", params_path, "--output", str(tmp_path / "pf"),
        "--num-classes", "6", "--batch", "2", "--pipeline", "device",
    ])
    miou = run_coco(args, scales=[1.0])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
    for i in range(3):
        assert osp.exists(osp.join(str(tmp_path / "pf"), f"{i}.png"))
