"""Trainer-CLI caffemodel dress rehearsal (VERDICT r3 item 6).

The first command a real-VOC user runs is the ``run.sh:5`` equivalent:
``train.py --stage s --weights vgg16_20M_mc.caffemodel`` (the reference's
``net.copy_from`` warm start, ``training/tools/train.py:59-62``).  This test
synthesizes a FULL VGG16-layout ``.caffemodel`` (independent protobuf
wire-format encoder, shared with test_import_caffe), drives the actual CLI
end-to-end on a tiny synthetic VOC tree, and asserts the imported weights
landed: with ``--base-lr 0`` the Caffe-SGD update is exactly zero, so the
snapshot written by the run must contain the caffemodel's weights verbatim.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db
from dsrg_tpu.models import DeepLabLargeFOV
from tests.test_import_caffe import _layer_v2

pytestmark = pytest.mark.slow


def _synth_vgg16_caffemodel(path: str, num_classes: int = 21) -> dict:
    """Write a caffemodel holding every conv layer of the VGG16-LargeFOV
    graph (backbone + all four dilated heads), caffe (out,in,kh,kw) layout.
    Returns {layer_name: flax-layout kernel} for the landing assertions."""
    model = DeepLabLargeFOV(num_classes=num_classes)
    params = model.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    rng = np.random.default_rng(11)
    wire = b""
    expected = {}
    for name, leaf in params.items():
        if not (isinstance(leaf, dict) and "kernel" in leaf):
            continue
        kshape = np.shape(leaf["kernel"])  # flax: (kh, kw, in, out)
        kernel = rng.normal(size=kshape).astype(np.float32) * 0.05
        bias = rng.normal(size=(kshape[-1],)).astype(np.float32) * 0.05
        expected[name] = kernel
        wire += _layer_v2(name, [kernel.transpose(3, 2, 0, 1), bias])
    open(path, "wb").write(wire)
    assert len(expected) > 15  # full backbone + heads, not a toy subset
    return expected


@pytest.fixture
def tiny_voc(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    rng = np.random.default_rng(0)
    entries = {}
    with open(root / "input_list.txt", "w") as f:
        for i in range(4):
            img_id = f"2007_{i:06d}"
            arr = rng.integers(0, 255, (45, 55, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
            entries[i] = (
                np.array([2]),
                (rng.integers(0, 3, 4) * 2, rng.integers(0, 6, 4), rng.integers(0, 6, 4)),
            )
            f.write(f"{img_id}.jpg {i}\n")
    save_cue_db(str(root / "cues.pickle"), entries)
    return root


def test_trainer_cli_warm_starts_from_caffemodel(tiny_voc, tmp_path):
    root = tiny_voc
    model_path = str(tmp_path / "vgg16_synth.caffemodel")
    expected = _synth_vgg16_caffemodel(model_path)

    from dsrg_tpu.tools import train as train_tool

    snap_dir = str(tmp_path / "models")
    train_tool.main([
        "--stage", "s",
        "--image-dir", str(root / "JPEGImages"),
        "--input-list", str(root / "input_list.txt"),
        "--cues", str(root / "cues.pickle"),
        "--weights", model_path,
        "--snapshot-dir", snap_dir,
        "--max-iter", "2", "--batch-size", "2", "--crop-size", "41",
        "--base-lr", "0",  # zero update -> snapshot == imported weights
        "--snapshot-every", "2", "--display", "1", "--no-mesh",
        "--sync-snapshots",
    ])

    from dsrg_tpu.train.checkpoint import load_params

    saved = load_params(osp.join(snap_dir, "step_2_params"))
    for name, kernel in expected.items():
        np.testing.assert_allclose(
            np.asarray(saved[name]["kernel"]), kernel, rtol=1e-6,
            err_msg=f"caffemodel weights did not land for layer {name}",
        )
