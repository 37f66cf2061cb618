"""Uneven-batch padding: ``pad_batch_to_multiple`` + masked step reductions.

The reference's recipes use batch 20 (stage 1) and batch 10 (stage 2)
(``train-s.prototxt:17-19``, ``train-f.prototxt:11``) — neither divides an
8-chip mesh.  Padded rows must shard the batch evenly while contributing
exactly nothing to losses/gradients/metrics (VERDICT r3 item 1).  Fast tier:
pure-numpy helper behavior + single-device masked-step equivalence; the
8-device shard_map equivalences live in test_dp_equivalence/test_dp_production
(slow tier).
"""

import jax
import numpy as np

from dsrg_tpu.parallel import pad_batch_to_multiple


def test_pad_batch_adds_mask_and_replicates_last_row():
    batch = {
        "images": np.arange(5 * 2 * 2 * 3, dtype=np.uint8).reshape(5, 2, 2, 3),
        "labels": np.arange(10, dtype=np.float32).reshape(5, 2),
    }
    out = pad_batch_to_multiple(batch, 8)
    assert out["images"].shape == (8, 2, 2, 3)
    assert out["labels"].shape == (8, 2)
    np.testing.assert_array_equal(out["pad_mask"], [1, 1, 1, 1, 1, 0, 0, 0])
    # originals intact, pad rows replicate the last real sample
    np.testing.assert_array_equal(out["images"][:5], batch["images"])
    for i in (5, 6, 7):
        np.testing.assert_array_equal(out["images"][i], batch["images"][4])
        np.testing.assert_array_equal(out["labels"][i], batch["labels"][4])
    assert out["images"].dtype == np.uint8


def test_pad_batch_noop_when_divisible():
    batch = {"images": np.zeros((8, 2, 2, 3), np.float32)}
    out = pad_batch_to_multiple(batch, 4)
    assert out["images"].shape == (8, 2, 2, 3)
    np.testing.assert_array_equal(out["pad_mask"], np.ones(8))


def test_stage1_step_masks_pad_rows_single_device():
    """The masked padded step == the unpadded step, bit-for-bit metrics."""
    from dsrg_tpu.config import Stage1Config
    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step

    cfg = Stage1Config(
        batch_size=3, crop_size=41, cue_size=6, num_classes=5,
        crf_iters=2, mirror=False,
    )
    model = DeepLabLargeFOV(num_classes=5, head_dilations=(2, 4), dropout_rate=0.0)
    state, tx, _ = init_stage1(model, cfg)

    rng = np.random.default_rng(0)
    labels = np.zeros((3, 5), np.float32)
    labels[:, 0] = labels[:, 3] = 1.0
    batch = {
        "images": rng.normal(size=(3, 41, 41, 3)).astype(np.float32) * 20,
        "labels": labels,
        "cues": (rng.uniform(size=(3, 6, 6, 5)) < 0.1).astype(np.float32)
        * labels[:, None, None, :],
    }
    step = jax.jit(make_stage1_step(model, cfg, tx))
    s_plain, m_plain = step(state, batch)

    padded = pad_batch_to_multiple(batch, 4)
    assert padded["images"].shape[0] == 4
    step_p = jax.jit(make_stage1_step(model, cfg, tx))
    s_pad, m_pad = step_p(state, padded)

    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_pad["loss"]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        float(m_plain["seed_pixels"]), float(m_pad["seed_pixels"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_stage2_step_masks_pad_rows_single_device():
    from dsrg_tpu.config import Stage2Config
    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.train.stage2 import init_stage2, make_stage2_step

    cfg = Stage2Config(batch_size=3, crop_size=41, num_classes=5, mirror=False)
    model = DeepLabLargeFOV(num_classes=5, head_dilations=(2, 4), dropout_rate=0.0)
    state, tx, _ = init_stage2(model, cfg)

    rng = np.random.default_rng(1)
    gt = rng.integers(0, 5, size=(3, 41, 41)).astype(np.int32)
    gt[0, :10] = 255  # uneven ignore counts exercise VALID normalization
    batch = {
        "images": rng.normal(size=(3, 41, 41, 3)).astype(np.float32) * 20,
        "labels": gt,
    }
    step = jax.jit(make_stage2_step(model, cfg, tx))
    s_plain, m_plain = step(state, batch)

    padded = pad_batch_to_multiple(batch, 4)
    s_pad, m_pad = jax.jit(make_stage2_step(model, cfg, tx))(state, padded)

    np.testing.assert_allclose(float(m_plain["loss"]), float(m_pad["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m_plain["accuracy"]), float(m_pad["accuracy"]), rtol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
