import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import CueDB, save_cue_db
from dsrg_tpu.data.voc import Stage1Dataset, Stage2Dataset, preprocess_image
from dsrg_tpu.utils.confusion import ConfusionMatrix, confusion_matrix_np
from dsrg_tpu.utils.palette import read_mask_png, write_palette_png, write_png


def test_confusion_matrix_matches_loop_reference():
    rng = np.random.default_rng(0)
    nclass = 5
    gt = rng.integers(0, nclass, 500)
    gt[::17] = 255  # ignore
    pred = rng.integers(0, nclass, 500)
    m = confusion_matrix_np(gt, pred, nclass)
    # reference per-pixel loop (evaluate.py:62-68)
    ref = np.zeros((nclass, nclass))
    for g, p in zip(gt, pred):
        if g < nclass:
            ref[g, p] += 1.0
    np.testing.assert_array_equal(m, ref)


def test_jaccard_skips_empty_diagonal_classes():
    conf = ConfusionMatrix(3)
    conf.addM(np.array([[10, 2, 0], [1, 5, 0], [0, 0, 0]], np.float64))
    mean, per_class, _ = conf.jaccard()
    assert len(per_class) == 2  # class 2 skipped (diag == 0), evaluate.py:55-57
    np.testing.assert_allclose(per_class[0], 10 / 13)
    np.testing.assert_allclose(per_class[1], 5 / 8)


def test_palette_png_roundtrip(tmp_path):
    mask = np.random.default_rng(1).integers(0, 21, (33, 44)).astype(np.uint8)
    p1 = str(tmp_path / "raw.png")
    p2 = str(tmp_path / "pal.png")
    write_png(mask, p1)
    write_palette_png(mask, p2)
    np.testing.assert_array_equal(read_mask_png(p1), mask)
    np.testing.assert_array_equal(read_mask_png(p2), mask)


def test_cue_db_roundtrip(tmp_path):
    path = str(tmp_path / "cues.pickle")
    save_cue_db(
        path,
        {
            7: (np.array([3, 5]), (np.array([0, 3, 5]), np.array([1, 2, 3]), np.array([4, 5, 6]))),
        },
    )
    db = CueDB(path, num_classes=8, cue_size=10)
    assert 7 in db
    labels = db.labels(7)
    np.testing.assert_array_equal(np.where(labels)[0], [0, 3, 5])
    cues = db.cues(7)
    assert cues.shape == (10, 10, 8)
    # entries are (class, row, col) triples: (0,1,4), (3,2,5), (5,3,6)
    assert cues[1, 4, 0] == 1.0 and cues[2, 5, 3] == 1.0 and cues[3, 6, 5] == 1.0
    assert cues.sum() == 3


@pytest.fixture
def voc_fixture(tmp_path):
    """Tiny synthetic VOC tree: JPEGImages, cue pickle, pseudo-GT masks."""
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "gt").mkdir()
    rng = np.random.default_rng(0)
    ids = []
    entries = {}
    for i in range(4):
        img_id = f"2007_{i:06d}"
        ids.append(img_id)
        arr = rng.integers(0, 255, (50 + i * 7, 60, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
        mask = rng.integers(0, 6, (50 + i * 7, 60)).astype(np.uint8)
        Image.fromarray(mask).save(root / "gt" / f"{img_id}.png")
        n_cues = 5
        entries[i] = (
            np.array([2, 4]),
            (
                rng.integers(1, 6, n_cues),
                rng.integers(0, 5, n_cues),
                rng.integers(0, 5, n_cues),
            ),
        )
    save_cue_db(str(root / "cues.pickle"), entries)
    with open(root / "input_list.txt", "w") as f:
        for i, img_id in enumerate(ids):
            f.write(f"{img_id}.jpg {i}\n")
    with open(root / "pairs.txt", "w") as f:
        for img_id in ids:
            f.write(f"/JPEGImages/{img_id}.jpg /gt/{img_id}.png\n")
    with open(root / "val_id.txt", "w") as f:
        for img_id in ids:
            f.write(img_id + "\n")
    return root, ids


def test_stage1_dataset_batches(voc_fixture):
    root, ids = voc_fixture
    db = CueDB(str(root / "cues.pickle"), num_classes=6, cue_size=5)
    ds = Stage1Dataset(
        str(root / "JPEGImages"), str(root / "input_list.txt"), db,
        crop_size=33, batch_size=3,
    )
    batch = ds.next_batch()
    assert batch["images"].shape == (3, 33, 33, 3)
    assert batch["labels"].shape == (3, 6)
    assert batch["cues"].shape == (3, 5, 5, 6)
    assert np.all(batch["labels"][:, 0] == 1.0)  # bg bit
    assert np.isfinite(batch["images"]).all()


def test_stage2_dataset_batches(voc_fixture):
    root, ids = voc_fixture
    ds = Stage2Dataset(str(root), str(root / "pairs.txt"), crop_size=64, batch_size=2)
    batch = ds.next_batch()
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["labels"].shape == (2, 64, 64)
    # padding area (images are 50-71 x 60) carries the ignore label
    assert (batch["labels"] == 255).any()


def test_stage1_seek_reproduces_uninterrupted_order(voc_fixture):
    """Data order is a pure function of (seed, batch index): a resumed run
    (seek) replays exactly the batches the uninterrupted run would draw —
    the host-side half of bit-consistent --auto-resume (the device half is
    the checkpointed state.rng stream)."""
    root, ids = voc_fixture
    db = CueDB(str(root / "cues.pickle"), num_classes=6, cue_size=5)
    mk = lambda: Stage1Dataset(
        str(root / "JPEGImages"), str(root / "input_list.txt"), db,
        crop_size=33, batch_size=3, workers=1,
    )
    ref = mk()
    full = [ref.next_batch() for _ in range(6)]
    resumed = mk()
    resumed.seek(4)
    for k in range(4, 6):
        got = resumed.next_batch()
        for key in full[k]:
            np.testing.assert_array_equal(got[key], full[k][key])


def test_stage2_seek_reproduces_crops_too(voc_fixture):
    """Stage-2 random crops are keyed to the sample index, so a resume
    reproduces the crop offsets as well as the image order."""
    root, ids = voc_fixture
    mk = lambda: Stage2Dataset(
        str(root), str(root / "pairs.txt"), crop_size=48, batch_size=2, workers=1,
    )
    full = [mk().next_batch() for _ in range(1)]  # fresh dataset: batch 0
    ref = mk()
    batches = [ref.next_batch() for _ in range(5)]
    for key in full[0]:
        np.testing.assert_array_equal(batches[0][key], full[0][key])
    resumed = mk()
    resumed.seek(3)
    for k in range(3, 5):
        got = resumed.next_batch()
        for key in batches[k]:
            np.testing.assert_array_equal(got[key], batches[k][key])


def test_ship_uint8_matches_float_path(voc_fixture):
    """uint8 canvas shipping + on-device mean-sub vs the host float path:
    exact for stage 2 (integer pixels, mean-padding == zero-padding after
    normalize), <= 0.5 resize quantization for stage 1."""
    from dsrg_tpu.train.stage1 import BGR_MEAN

    root, ids = voc_fixture
    db = CueDB(str(root / "cues.pickle"), num_classes=6, cue_size=5)
    mk1 = lambda u8: Stage1Dataset(
        str(root / "JPEGImages"), str(root / "input_list.txt"), db,
        crop_size=33, batch_size=3, workers=1, ship_uint8=u8,
    )
    f = mk1(False).next_batch()
    u = mk1(True).next_batch()
    assert u["images"].dtype == np.uint8
    norm = u["images"].astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
    assert np.abs(norm - f["images"]).max() <= 0.5 + 1e-5

    mk2 = lambda u8: Stage2Dataset(
        str(root), str(root / "pairs.txt"), crop_size=64, batch_size=2,
        workers=1, ship_uint8=u8,
    )
    f2 = mk2(False).next_batch()
    u2 = mk2(True).next_batch()
    assert u2["images"].dtype == np.uint8
    norm2 = u2["images"].astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
    np.testing.assert_array_equal(norm2, f2["images"])
    np.testing.assert_array_equal(u2["labels"], f2["labels"])


def test_stage1_decoded_cache_roundtrip(voc_fixture, tmp_path):
    """Second pass over the dataset serves bit-identical canvases from the
    memmap cache (and a fresh dataset instance reuses the on-disk cache)."""
    root, ids = voc_fixture
    db = CueDB(str(root / "cues.pickle"), num_classes=6, cue_size=5)
    mk = lambda: Stage1Dataset(
        str(root / "JPEGImages"), str(root / "input_list.txt"), db,
        crop_size=33, batch_size=4, workers=1, ship_uint8=True,
        cache_dir=str(tmp_path / "cache"),
    )
    ds = mk()
    first = [ds.next_batch() for _ in range(2)]  # epoch 1: fills the cache
    assert ds._cache_flags.all()
    ds.seek(0)
    second = [ds.next_batch() for _ in range(2)]  # epoch 2: cache reads
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["images"], b["images"])
    ds2 = mk()  # fresh instance: picks up the persisted cache + flags
    assert ds2._cache_flags.all()
    third = ds2.next_batch()
    np.testing.assert_array_equal(third["images"], first[0]["images"])


def test_stage2_decoded_cache_roundtrip(voc_fixture, tmp_path):
    """Stage-2 padded-canvas cache: cache-served crops equal decode-path
    crops for the same sample indices (variable image sizes)."""
    mk = lambda root, cache: Stage2Dataset(
        str(root), str(root / "pairs.txt"), crop_size=48, batch_size=2,
        workers=1, ship_uint8=True,
        cache_dir=str(tmp_path / "c2") if cache else None,
    )
    root, ids = voc_fixture
    plain = [mk(root, False).next_batch() for _ in range(1)][0]
    ds = mk(root, True)
    filled = ds.next_batch()  # decode+fill
    for key in plain:
        np.testing.assert_array_equal(filled[key], plain[key])
    ds2 = mk(root, True)  # fresh instance, cache-served where filled
    served = ds2.next_batch()
    for key in plain:
        np.testing.assert_array_equal(served[key], plain[key])


def test_preprocess_matches_reference_recipe(voc_fixture):
    root, ids = voc_fixture
    from scipy.ndimage import zoom as ndzoom

    img = np.asarray(Image.open(root / "JPEGImages" / f"{ids[0]}.jpg").convert("RGB"), np.float32)
    bgr = img[:, :, ::-1]
    ours = preprocess_image(bgr, 21)
    ref = ndzoom(bgr, (21 / img.shape[0], 21 / img.shape[1], 1.0), order=1)
    ref = ref - np.array([104.0, 117.0, 123.0], np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_confusion_matrix_jax_matches_numpy():
    import jax.numpy as jnp

    from dsrg_tpu.utils.confusion import confusion_matrix_jax

    rng = np.random.default_rng(7)
    gt = rng.integers(0, 5, 300)
    gt[::11] = 255
    pred = rng.integers(0, 5, 300)
    got = np.asarray(confusion_matrix_jax(jnp.asarray(gt), jnp.asarray(pred), 5))
    ref = confusion_matrix_np(gt, pred, 5)
    np.testing.assert_array_equal(got, ref)


def test_stage2_ship_uint8_rejects_custom_mean(voc_fixture):
    """ship_uint8 moves mean-sub on device (fixed BGR_MEAN constant): a
    custom mean must fail loudly, not normalize wrongly or silently
    fall back."""
    root, ids = voc_fixture
    with pytest.raises(ValueError, match="BGR_MEAN"):
        Stage2Dataset(
            str(root), str(root / "pairs.txt"), crop_size=48, batch_size=2,
            workers=1, ship_uint8=True, mean=np.array([110.0, 120.0, 125.0]),
        )


def test_stage2_cache_invalidated_on_pseudo_gt_redump(voc_fixture, tmp_path):
    """The two-round DSRG workflow re-dumps pseudo-GT over the same image
    list: the decoded cache tag fingerprints label files, so the retrain
    reads the NEW labels instead of stale cached ones."""
    import time

    root, ids = voc_fixture
    mk = lambda: Stage2Dataset(
        str(root), str(root / "pairs.txt"), crop_size=48, batch_size=2,
        workers=1, ship_uint8=True, cache_dir=str(tmp_path / "c"),
    )
    ds = mk()
    for _ in range(3):
        ds.next_batch()
    assert ds._cache_flags.any()
    # rewrite one pseudo-GT png with a new constant label
    lbl_path = ds._resolve(ds.entries[0][1])
    old_shape = np.asarray(Image.open(lbl_path)).shape[:2]
    new = np.full(old_shape, 3, np.uint8)
    time.sleep(0.01)
    Image.fromarray(new).save(lbl_path)
    ds2 = mk()
    assert not ds2._cache_flags.any()  # new fingerprint -> cold cache
    _, label = ds2._load_pair(0, crop_seed=1)
    assert set(np.unique(label)) <= {3, 255}


def test_synth_palette_is_separable_from_distractors():
    """Every labeled synthetic class must be separable by local appearance.

    ``texture_overlap`` paints *unlabeled* background patches in muted
    foreground colors (0.45*color + 0.55*base); a labeled color that lands
    inside that gamut is unlearnable under weak supervision — the original
    class-19 color sat 5.4 RGB units from muted class-1 red and collapsed to
    0.01 IoU in the production-length run.  Enforce the margins the palette
    was searched for (synth.py PALETTE comment)."""
    from dsrg_tpu.data.synth import (
        MIN_FG_MARGIN,
        MIN_GRAY_MARGIN,
        MIN_MUTED_MARGIN,
        signature_margins,
    )

    muted_d, fg_d, gray_d = signature_margins()
    assert muted_d.min() >= MIN_MUTED_MARGIN, muted_d
    assert fg_d.min() >= MIN_FG_MARGIN, fg_d
    assert gray_d.min() >= MIN_GRAY_MARGIN, gray_d


def test_synth_signatures_unique():
    """(color, shape, texture) triples must be pairwise distinct: two classes
    sharing a full signature would be mutually unlearnable by construction."""
    from dsrg_tpu.data.synth import class_signature

    sigs = []
    for cls in range(1, 21):
        color, shape, tex = class_signature(cls)
        sigs.append((tuple(color.tolist()), shape, tex))
    assert len(set(sigs)) == 20
