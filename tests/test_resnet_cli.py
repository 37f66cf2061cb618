"""ResNet-101 backbone through the full CLI pipeline (tiny stage-blocks via a
direct step test; CLI smoke with the real depth is too slow for CPU CI, so the
CLI path is exercised with the VGG e2e tests and ResNet with unit steps)."""

import jax
import numpy as np

from dsrg_tpu.config import Stage1Config, Stage2Config
from dsrg_tpu.models import ResNet101DeepLab
from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step
from dsrg_tpu.train.stage2 import init_stage2, make_stage2_step


def _tiny_resnet(m):
    return ResNet101DeepLab(num_classes=m, stage_blocks=(1, 1, 1, 1), head_dilations=(2, 4))


def test_resnet_stage1_step():
    cfg = Stage1Config(batch_size=2, crop_size=41, cue_size=6, num_classes=5, crf_iters=2)
    model = _tiny_resnet(cfg.num_classes)
    state, tx, extra = init_stage1(model, cfg)
    assert "batch_stats" in extra
    step = jax.jit(make_stage1_step(model, cfg, tx, extra_vars=extra))
    rng = np.random.default_rng(0)
    labels = np.zeros((2, 5), np.float32)
    labels[:, 0] = labels[:, 2] = 1
    batch = {
        "images": rng.normal(size=(2, 41, 41, 3)).astype(np.float32),
        "labels": labels,
        "cues": (rng.uniform(size=(2, 6, 6, 5)) < 0.1).astype(np.float32)
        * labels[:, None, None, :],
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert min(losses[-3:]) < losses[0]


def test_resnet_stage2_step():
    cfg = Stage2Config(batch_size=2, crop_size=41, num_classes=5)
    model = _tiny_resnet(cfg.num_classes)
    state, tx, extra = init_stage2(model, cfg)
    step = jax.jit(make_stage2_step(model, cfg, tx, extra_vars=extra))
    rng = np.random.default_rng(1)
    batch = {
        "images": rng.normal(size=(2, 41, 41, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, size=(2, 41, 41)).astype(np.int32),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert min(losses[-3:]) < losses[0]


def test_predictor_accepts_variables_dict():
    import jax.numpy as jnp

    from dsrg_tpu.inference import Predictor

    model = _tiny_resnet(4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )
    pred = Predictor(model, dict(variables), num_classes=4, bucket=1)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (41, 41, 3)).astype(np.uint8)
    mask = pred.predict_mask(image, sizes=[41], smooth=False)
    assert mask.shape == (41, 41)
