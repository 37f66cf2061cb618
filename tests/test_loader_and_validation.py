import numpy as np

from dsrg_tpu.data.loader import PrefetchLoader
import pytest


class _FiniteDataset:
    def __init__(self, n):
        self.n = n

    def __iter__(self):
        for i in range(self.n):
            yield {"x": np.full((2, 3), i, np.float32)}


def test_prefetch_loader_order_and_termination():
    loader = PrefetchLoader(_FiniteDataset(5), prefetch=2)
    seen = [int(np.asarray(b["x"])[0, 0]) for b in loader]
    assert seen == [0, 1, 2, 3, 4]


def test_prefetch_loader_close_midstream():
    loader = PrefetchLoader(_FiniteDataset(100), prefetch=2)
    next(loader)
    next(loader)
    loader.close()  # no hang/leak


class _PoisonDataset:
    """Raises partway through iteration (corrupt file, disk full, ...)."""

    def __iter__(self):
        yield {"x": np.zeros((2, 2), np.float32)}
        raise OSError("decode failed")


def test_prefetch_loader_surfaces_dataset_exception():
    """A dataset-iteration failure must reach the consumer, not kill the
    producer thread silently (which would hang the main loop forever)."""
    loader = PrefetchLoader(_PoisonDataset(), prefetch=2)
    next(loader)
    with pytest.raises(OSError, match="decode failed"):
        next(loader)


@pytest.mark.slow
def test_train_cli_validation(tmp_path):
    """--val-every path: tiny train run with in-loop mIoU validation."""
    import os.path as osp

    from PIL import Image

    from dsrg_tpu.data.cues import save_cue_db
    from dsrg_tpu.tools import train as train_tool

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.default_rng(0)
    ids, entries = [], {}
    for i in range(2):
        img_id = f"2007_{i:06d}"
        ids.append(img_id)
        Image.fromarray(rng.integers(0, 255, (45, 50, 3)).astype(np.uint8)).save(
            root / "JPEGImages" / f"{img_id}.jpg"
        )
        Image.fromarray(rng.integers(0, 21, (45, 50)).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{img_id}.png"
        )
        entries[i] = (np.array([2]), (np.zeros(2, int), np.arange(2), np.arange(2)))
    save_cue_db(str(root / "cues.pickle"), entries)
    (root / "input_list.txt").write_text(
        "\n".join(f"{i}.jpg {k}" for k, i in enumerate(ids)) + "\n"
    )
    (root / "val_id.txt").write_text("\n".join(ids) + "\n")

    metrics_log = str(tmp_path / "metrics.jsonl")
    train_tool.main([
        "--stage", "s",
        "--image-dir", str(root / "JPEGImages"),
        "--input-list", str(root / "input_list.txt"),
        "--cues", str(root / "cues.pickle"),
        "--snapshot-dir", str(tmp_path / "m"),
        "--max-iter", "1", "--batch-size", "2", "--crop-size", "41",
        "--snapshot-every", "1", "--display", "1", "--no-mesh",
        "--val-every", "1", "--val-ids", str(root / "val_id.txt"),
        "--val-dir", str(root), "--val-gt", str(root / "SegmentationClass"),
        "--metrics-log", metrics_log,
    ])
    import json

    lines = [json.loads(ln) for ln in open(metrics_log)]
    assert any("val_miou" in ln for ln in lines)
    miou = [ln["val_miou"] for ln in lines if "val_miou" in ln][0]
    assert 0.0 <= miou <= 1.0
