import numpy as np
from PIL import Image

from dsrg_tpu.data.coco import COCOCueDataset


def test_coco_cue_dataset(tmp_path):
    root = tmp_path
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        img = rng.integers(0, 255, (60 + i * 5, 70, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i}.jpg")
        lbl = rng.integers(0, 5, (60 + i * 5, 70)).astype(np.uint8)
        lbl[0, :] = 255  # ignore strip
        Image.fromarray(lbl).save(root / "labels" / f"{i}.png")
        rows.append(f"/images/{i}.jpg /labels/{i}.png")
    src = root / "list.txt"
    src.write_text("\n".join(rows) + "\n")

    ds = COCOCueDataset(str(root), str(src), batch_size=2, new_size=(40, 40), num_classes=81)
    batch = ds.next_batch()
    assert batch["images"].shape == (2, 40, 40, 3)
    assert batch["labels"].shape == (2, 81)
    assert batch["cues"].shape == (2, 6, 6, 81)
    # every non-ignore cue pixel carries exactly one class
    sums = batch["cues"].sum(-1)
    assert set(np.unique(sums)).issubset({0.0, 1.0})
    assert batch["labels"].sum() > 0
    # image labels only from classes 0..4 (plus none of the ignore)
    assert batch["labels"][:, 5:].sum() == 0


def _coco_fixture(root, n=3, seed=0):
    (root / "images").mkdir(exist_ok=True)
    (root / "labels").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        img = rng.integers(0, 255, (60 + i * 5, 70, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i}.jpg")
        lbl = rng.integers(0, 5, (60 + i * 5, 70)).astype(np.uint8)
        lbl[0, :] = 255
        Image.fromarray(lbl).save(root / "labels" / f"{i}.png")
        rows.append(f"/images/{i}.jpg /labels/{i}.png")
    src = root / "list.txt"
    src.write_text("\n".join(rows) + "\n")
    return src


def test_coco_ship_uint8_matches_float_path(tmp_path):
    """uint8 canvases + device-side COCO_MEAN subtraction vs the float
    path: <= 0.5 resize quantization; cues/labels exactly equal."""
    from dsrg_tpu.data.coco import COCO_MEAN

    src = _coco_fixture(tmp_path)
    mk = lambda u8: COCOCueDataset(
        str(tmp_path), str(src), batch_size=2, new_size=(40, 40),
        num_classes=81, ship_uint8=u8,
    )
    f = mk(False).next_batch()
    u = mk(True).next_batch()
    assert u["images"].dtype == np.uint8 and u["cues"].dtype == np.uint8
    norm = u["images"].astype(np.float32) - COCO_MEAN
    assert np.abs(norm - f["images"]).max() <= 0.5 + 1e-5
    np.testing.assert_array_equal(u["cues"].astype(np.float32), f["cues"])
    np.testing.assert_array_equal(u["labels"], f["labels"])


def test_coco_decoded_cache_roundtrip(tmp_path):
    """Cache-served batches are identical to decode-path batches, and a
    fresh instance reuses the persisted cache."""
    src = _coco_fixture(tmp_path)
    mk = lambda cache: COCOCueDataset(
        str(tmp_path), str(src), batch_size=2, new_size=(40, 40),
        num_classes=81, ship_uint8=True,
        cache_dir=str(tmp_path / "cache") if cache else None,
    )
    plain = mk(False).next_batch()
    ds = mk(True)
    filled = ds.next_batch()  # decode + fill
    for k in plain:
        np.testing.assert_array_equal(filled[k], plain[k])
    ds2 = mk(True)  # fresh instance, cache-served
    served = ds2.next_batch()
    for k in plain:
        np.testing.assert_array_equal(served[k], plain[k])


def test_coco_cache_invalidated_on_label_change(tmp_path):
    """Rewriting a label png (e.g. a re-dumped pseudo-GT) must invalidate
    the decoded cache (fingerprinted tag), not serve stale labels."""
    import time

    src = _coco_fixture(tmp_path)
    mk = lambda: COCOCueDataset(
        str(tmp_path), str(src), batch_size=3, new_size=(40, 40),
        num_classes=81, ship_uint8=True, cache_dir=str(tmp_path / "cache"),
    )
    ds = mk()
    ds.next_batch()  # fills cache for all 3 entries
    lbl = np.full((60, 70), 7, np.uint8)
    time.sleep(0.01)  # ensure a distinct mtime_ns
    Image.fromarray(lbl).save(tmp_path / "labels" / "0.png")
    ds2 = mk()
    assert not ds2._cache_flags.any()  # new fingerprint -> cold cache
    # entry 0's cues now reflect the rewritten label
    _, hot, cues = ds2._load_one(0)
    assert hot[7] == 1 and cues[..., 7].sum() == cues.sum()
