"""End-to-end smoke tests of the stage-1/stage-2 train steps on tiny shapes,
single device and on an 8-device virtual CPU mesh via shard_map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsrg_tpu.config import Stage1Config, Stage2Config
from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.parallel import data_parallel_step, make_mesh, shard_batch
from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step
from dsrg_tpu.train.stage2 import init_stage2, make_stage2_step

TINY1 = Stage1Config(batch_size=2, crop_size=41, cue_size=6, num_classes=6, crf_iters=2)
TINY2 = Stage2Config(batch_size=2, crop_size=41, num_classes=6)


def _stage1_batch(rng, b, cfg):
    h = (cfg.crop_size - 1) // 8 + 1
    labels = np.zeros((b, cfg.num_classes), np.float32)
    labels[:, 0] = 1.0
    labels[:, 2] = 1.0
    cues = (rng.uniform(size=(b, h, h, cfg.num_classes)) < 0.05).astype(np.float32)
    cues *= labels[:, None, None, :]
    return {
        "images": rng.normal(size=(b, cfg.crop_size, cfg.crop_size, 3)).astype(np.float32) * 30,
        "labels": labels,
        "cues": cues,
    }


def test_stage1_step_runs_and_loss_decreases():
    cfg = TINY1
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    from dsrg_tpu.train.stage1 import make_optimizer

    state, tx, _ = init_stage1(model, cfg)
    step = jax.jit(make_stage1_step(model, cfg, tx))
    rng = np.random.default_rng(0)
    batch = _stage1_batch(rng, cfg.batch_size, cfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]  # same batch -> loss must drop
    assert int(state.step) == 5


@pytest.mark.slow
def test_stage1_step_data_parallel_matches_semantics():
    cfg = TINY1
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    state, tx, _ = init_stage1(model, cfg)
    mesh = make_mesh()
    assert mesh.size == 8
    step = data_parallel_step(
        make_stage1_step(model, cfg, tx, axis_name="data"), mesh, donate_state=False
    )
    rng = np.random.default_rng(1)
    batch = _stage1_batch(rng, 8, cfg)
    sharded = shard_batch(batch, mesh)
    state2, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    # params updated and remain replicated
    assert int(state2.step) == 1


def test_stage2_step_runs_and_loss_decreases():
    cfg = TINY2
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    state, tx, _ = init_stage2(model, cfg)
    step = jax.jit(make_stage2_step(model, cfg, tx))
    rng = np.random.default_rng(2)
    labels = rng.integers(0, cfg.num_classes, size=(2, cfg.crop_size, cfg.crop_size))
    labels[0, :5, :] = 255
    batch = {
        "images": rng.normal(size=(2, cfg.crop_size, cfg.crop_size, 3)).astype(np.float32) * 30,
        "labels": labels.astype(np.int32),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0]


def test_stage2_step_data_parallel():
    cfg = TINY2
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    state, tx, _ = init_stage2(model, cfg)
    mesh = make_mesh()
    step = data_parallel_step(
        make_stage2_step(model, cfg, tx, axis_name="data"), mesh, donate_state=False
    )
    rng = np.random.default_rng(3)
    batch = {
        "images": rng.normal(size=(8, cfg.crop_size, cfg.crop_size, 3)).astype(np.float32),
        "labels": rng.integers(0, cfg.num_classes, size=(8, cfg.crop_size, cfg.crop_size)).astype(np.int32),
    }
    state2, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))


def test_stage1_step_true_grad_crf():
    """crf_true_grad=True (CRF-as-RNN backward) trains: the step compiles
    with reverse-mode autodiff through the mean-field loop and the loss
    drops on a repeated batch."""
    import dataclasses

    cfg = dataclasses.replace(TINY1, crf_true_grad=True)
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=(2, 4))
    state, tx, _ = init_stage1(model, cfg)
    step = jax.jit(make_stage1_step(model, cfg, tx))
    rng = np.random.default_rng(3)
    batch = _stage1_batch(rng, cfg.batch_size, cfg)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
