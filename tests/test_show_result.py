import os.path as osp

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_show_result_cli(tmp_path):
    # build a tiny params checkpoint the tool can load
    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.train.checkpoint import save_params

    model = DeepLabLargeFOV(num_classes=21)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    model_path = str(tmp_path / "params")
    save_params(model_path, params)

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.default_rng(0)
    img_id = "2007_000001"
    Image.fromarray(rng.integers(0, 255, (45, 50, 3)).astype(np.uint8)).save(
        root / "JPEGImages" / f"{img_id}.jpg"
    )
    Image.fromarray(rng.integers(0, 21, (45, 50)).astype(np.uint8)).save(
        root / "SegmentationClass" / f"{img_id}.png"
    )
    (root / "ids.txt").write_text(img_id + "\n")

    from dsrg_tpu.tools import show_result

    out = str(tmp_path / "vis")
    show_result.main([
        "--images", str(root / "ids.txt"), "--dir", str(root),
        "--model", model_path, "--output", out,
        "--gt", str(root / "SegmentationClass"), "--save-probs",
    ])
    vis = np.asarray(Image.open(osp.join(out, img_id + "_vis.png")))
    assert vis.shape == (45, 150, 3)  # image | pred | gt side by side
    assert osp.exists(osp.join(out, img_id + ".png"))
    probs = np.load(osp.join(out, img_id + ".npy"))
    assert probs.shape == (45, 50, 21)
