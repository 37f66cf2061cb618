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


def test_pad_batch_to_rows_exact_and_all_pad():
    """Process-level uneven batching (VERDICT r4 item 3): pad to an EXACT
    row count with an explicit valid prefix, including the all-padding
    process (n_valid=0) whose rows are masked replicas of one real sample."""
    from dsrg_tpu.parallel.mesh import pad_batch_to_rows

    batch = {"images": np.arange(2 * 3, dtype=np.float32).reshape(2, 3)}
    out = pad_batch_to_rows(batch, 4, n_valid=1)
    assert out["images"].shape == (4, 3)
    np.testing.assert_array_equal(out["pad_mask"], [1, 0, 0, 0])
    np.testing.assert_array_equal(out["images"][2], batch["images"][1])

    allpad = pad_batch_to_rows({"x": np.ones((1, 2))}, 3, n_valid=0)
    np.testing.assert_array_equal(allpad["pad_mask"], [0, 0, 0])
    assert allpad["x"].shape == (3, 2)

    noop = pad_batch_to_rows({"x": np.ones((4, 2))}, 4)
    np.testing.assert_array_equal(noop["pad_mask"], np.ones(4))


def test_process_geometry_matches_single_process_padded_layout():
    """The per-process (rows, start, n_real) tiling reconstructs EXACTLY the
    single-process padded global batch: real rows 0..B-1 in order, then
    replicas of row B-1 — for dividing and non-dividing process counts."""
    from dsrg_tpu.tools.train import _process_geometry

    for B, P, D in [(20, 8, 8), (20, 2, 8), (20, 4, 8), (3, 2, 8),
                    (5, 2, 8), (10, 8, 8), (8, 2, 8), (24, 8, 8)]:
        padded = -(-B // D) * D
        rows_list = [_process_geometry(B, P, p, D) for p in range(P)]
        assert all(r[0] == padded // P for r in rows_list)
        # contiguous tiling covering every padded row exactly once
        assert [r[1] for r in rows_list] == [p * (padded // P) for p in range(P)]
        assert sum(r[2] for r in rows_list) == B
        # each process's real span stays inside the global batch
        for rows, start, n_real in rows_list:
            assert 0 <= n_real <= rows
            if n_real:
                assert start + n_real <= B


def test_epoch_order_uneven_shard_mapping():
    """configure_shard(start_row, global_batch): local draws map onto the
    single-process global order, with the all-pad process clamped to the
    global batch's last row."""
    from dsrg_tpu.data.voc import _EpochOrder

    B, n = 5, 40  # global batch 5 over 2 processes x 4 devices: rows=4

    def draws(start_row, local_bs, steps=3):
        d = _EpochOrder.__new__(_EpochOrder)
        _EpochOrder.__init__(d, n, shuffle=True, seed=7)
        d.batch_size = local_bs
        d.configure_shard(0 if start_row == 0 else 1, 2,
                          start_row=start_row, global_batch=B)
        return [d._next_index() for _ in range(local_bs * steps)]

    ref = _EpochOrder.__new__(_EpochOrder)
    _EpochOrder.__init__(ref, n, shuffle=True, seed=7)
    ref.batch_size = B
    global_order = [ref._next_index() for _ in range(B * 3)]

    p0 = draws(start_row=0, local_bs=4)
    p1 = draws(start_row=4, local_bs=1)
    for t in range(3):
        assert p0[t * 4:(t + 1) * 4] == global_order[t * B: t * B + 4]
        assert p1[t] == global_order[t * B + 4]

    # all-pad process (global batch 3, rows 4/process, p1 start past B):
    # clamps every draw to the global batch's last row
    d = _EpochOrder.__new__(_EpochOrder)
    _EpochOrder.__init__(d, n, shuffle=True, seed=7)
    d.batch_size = 1
    d.configure_shard(1, 2, start_row=2, global_batch=3)
    ref2 = _EpochOrder.__new__(_EpochOrder)
    _EpochOrder.__init__(ref2, n, shuffle=True, seed=7)
    ref2.batch_size = 3
    g2 = [ref2._next_index() for _ in range(9)]
    assert [d._next_index() for _ in range(3)] == [g2[2], g2[5], g2[8]]
