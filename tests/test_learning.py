"""Behavioral test of the full DSRG mechanism on a synthetic weak-supervision
task: images contain a colored square; supervision is only a few seed pixels
inside the square plus background seeds at the border.  After a short
training run the network should (a) reduce its loss, (b) grow the seeds well
beyond the initial cues, and (c) predict the object class inside the square."""

import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.config import Stage1Config
from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step

import pytest

# e2e/subprocess/distributed tier (VERDICT r2 item 6): excluded from the
# fast core gate via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

OBJ = 2  # object class id


def _make_batch(rng, b=4, crop=41, m=4):
    h = (crop - 1) // 8 + 1  # 6
    images = np.full((b, crop, crop, 3), -60.0, np.float32)
    labels = np.zeros((b, m), np.float32)
    labels[:, 0] = 1.0
    labels[:, OBJ] = 1.0
    cues = np.zeros((b, h, h, m), np.float32)
    boxes = []
    for i in range(b):
        y0, x0 = rng.integers(4, 12, 2)
        y1, x1 = y0 + rng.integers(16, 24), x0 + rng.integers(16, 24)
        y1, x1 = min(y1, crop - 4), min(x1, crop - 4)
        images[i, y0:y1, x0:x1] = [80.0, -40.0, 60.0]  # distinct color
        boxes.append((y0, x0, y1, x1))
        # object seed: center cell of the box at cue resolution
        cy, cx = ((y0 + y1) // 2) // 8, ((x0 + x1) // 2) // 8
        cues[i, cy, cx, OBJ] = 1.0
        # background seeds: the four cue-grid corners
        for yy, xx in [(0, 0), (0, h - 1), (h - 1, 0), (h - 1, h - 1)]:
            cues[i, yy, xx, 0] = 1.0
    images += rng.normal(size=images.shape).astype(np.float32) * 3.0
    return {"images": images, "labels": labels, "cues": cues}, boxes


def test_dsrg_training_learns_synthetic_objects():
    cfg = Stage1Config(
        batch_size=4, crop_size=41, cue_size=6, num_classes=4,
        crf_iters=3, base_lr=2e-3, stepsize=10_000, mirror=False,
        fast_dropout_rng=False,  # keep the test's trajectory deterministic
    )
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    state, tx, _ = init_stage1(model, cfg)
    step = jax.jit(make_stage1_step(model, cfg, tx))

    rng = np.random.default_rng(0)
    batch, boxes = _make_batch(rng)

    first_loss = None
    first_seeds = None
    for it in range(40):
        state, metrics = step(state, batch)
        if it == 0:
            first_loss = float(metrics["loss"])
            first_seeds = float(metrics["seed_pixels"])
    final_loss = float(metrics["loss"])
    final_seeds = float(metrics["seed_pixels"])

    assert final_loss < first_loss * 0.7, (first_loss, final_loss)
    # region growing expanded supervision well beyond the 5 cues/image
    assert final_seeds > first_seeds, (first_seeds, final_seeds)
    assert final_seeds > 4 * 10  # > 10 seed pixels per image on average

    # the network now segments the squares
    scores = model.apply({"params": state.params}, jnp.asarray(batch["images"]), train=False)
    pred = np.asarray(scores).argmax(-1)  # (B, 6, 6)
    inside_correct, outside_bg = [], []
    for i, (y0, x0, y1, x1) in enumerate(boxes):
        gy0, gx0 = -(-y0 // 8), -(-x0 // 8)
        gy1, gx1 = y1 // 8, x1 // 8
        if gy1 > gy0 and gx1 > gx0:
            inside = pred[i, gy0:gy1, gx0:gx1]
            inside_correct.append((inside == OBJ).mean())
        outside = np.concatenate([pred[i, 0, :], pred[i, -1, :], pred[i, :, 0], pred[i, :, -1]])
        outside_bg.append((outside == 0).mean())
    assert np.mean(inside_correct) > 0.6, inside_correct
    assert np.mean(outside_bg) > 0.6, outside_bg
