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
