"""Full two-stage recipe driver smoke test on a synthetic VOC tree:
stage-s train -> pseudo-GT dump -> stage-f retrain -> final predictions ->
mIoU evaluation (the run.sh pipeline end-to-end)."""

import os.path as osp

import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db

# e2e/subprocess/distributed tier (VERDICT r2 item 6): excluded from the
# fast core gate via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


@pytest.fixture
def voc_tree(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    lists = tmp_path / "lists"
    lists.mkdir()
    rng = np.random.default_rng(0)
    ids, entries = [], {}
    for i in range(3):
        img_id = f"2007_{i:06d}"
        ids.append(img_id)
        Image.fromarray(rng.integers(0, 255, (45, 55, 3)).astype(np.uint8)).save(
            root / "JPEGImages" / f"{img_id}.jpg"
        )
        Image.fromarray(rng.integers(0, 21, (45, 55)).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{img_id}.png"
        )
        entries[i] = (
            np.array([2]),
            (rng.integers(0, 3, 4) * 2, rng.integers(0, 6, 4), rng.integers(0, 6, 4)),
        )
    save_cue_db(str(tmp_path / "cues.pickle"), entries)
    (lists / "input_list.txt").write_text(
        "\n".join(f"{i}.jpg {k}" for k, i in enumerate(ids)) + "\n"
    )
    (lists / "train_aug_id.txt").write_text("\n".join(ids) + "\n")
    (lists / "val_id.txt").write_text("\n".join(ids) + "\n")
    return root, lists, tmp_path


def test_run_recipe_end_to_end(voc_tree, tmp_path):
    root, lists, base = voc_tree
    from dsrg_tpu.tools import run_recipe

    work = str(base / "work")
    run_recipe.main([
        "--pascal-dir", str(root), "--list-dir", str(lists),
        "--cues", str(base / "cues.pickle"), "--work-dir", work,
        "--stage1-iters", "1", "--stage2-iters", "1",
        "--batch-size", "2", "--crop-size", "41",
        "--test-sizes", "41", "--test-scales", "1.0",
        "--no-smooth", "--dtype", "float32", "--in-process",
    ])
    result = open(osp.join(work, "DSRG_result_final.txt")).read()
    assert result.startswith("meanIOU: ")
    miou = float(result.splitlines()[0].split()[1])
    assert 0.0 <= miou <= 1.0
    # pseudo-GT masks were produced for every train image
    for i in range(3):
        assert osp.exists(osp.join(work, "DSRGOutput", f"2007_{i:06d}.png"))
        assert osp.exists(osp.join(work, "DSRG_final_output", f"2007_{i:06d}.png"))


def test_run_recipe_parity_mode(voc_tree, tmp_path):
    """--parity: fp32 everywhere, serial per-image inference (batch 1,
    bucket 1), CRF smoothing through the engine dispatcher — the documented
    reference-parity configuration runs end-to-end."""
    root, lists, base = voc_tree
    from dsrg_tpu.tools import run_recipe

    work = str(base / "work_parity")
    run_recipe.main([
        "--pascal-dir", str(root), "--list-dir", str(lists),
        "--cues", str(base / "cues.pickle"), "--work-dir", work,
        "--stage1-iters", "1", "--stage2-iters", "1",
        "--batch-size", "2", "--crop-size", "41",
        "--test-sizes", "41", "--test-scales", "1.0",
        "--parity", "--in-process",
    ])
    result = open(osp.join(work, "DSRG_result_final.txt")).read()
    assert result.startswith("meanIOU: ")


def test_run_recipe_production_flags_and_relaunch(voc_tree, tmp_path):
    """The production-operation pass-throughs (--ship-uint8 --cache-decoded
    --auto-resume --val-every) run end-to-end, and RELAUNCHING the identical
    command after completion is a cheap no-op pass over every phase
    (trainers restore their final snapshot and skip, dumps --skip-existing):
    the relaunch-safety contract the full-length production run relies on."""
    import os

    root, lists, base = voc_tree
    from dsrg_tpu.tools import run_recipe

    work = str(base / "work_prod")
    argv = [
        "--pascal-dir", str(root), "--list-dir", str(lists),
        "--cues", str(base / "cues.pickle"), "--work-dir", work,
        "--stage1-iters", "1", "--stage2-iters", "1",
        "--batch-size", "2", "--crop-size", "41",
        "--test-sizes", "41", "--test-scales", "1.0",
        "--no-smooth", "--dtype", "float32",
        "--ship-uint8", "--cache-decoded", "--auto-resume", "--val-every", "1",
    ]
    run_recipe.main(argv)
    result1 = open(osp.join(work, "DSRG_result_final.txt")).read()
    assert result1.startswith("meanIOU: ")
    # validation ran in both stages (metrics JSONL carries val_miou rows)
    for log in ("metrics-s.jsonl", "metrics-f.jsonl"):
        assert "val_miou" in open(osp.join(work, log)).read()
    mtimes = {
        p: os.path.getmtime(osp.join(work, p))
        for p in ("model-s/step_1_params", "model-f/step_1_params",
                  "DSRGOutput/2007_000000.png")
    }
    run_recipe.main(argv)  # relaunch: every phase resumes/skips
    result2 = open(osp.join(work, "DSRG_result_final.txt")).read()
    assert result2.splitlines()[0] == result1.splitlines()[0]
    for p, t in mtimes.items():
        assert os.path.getmtime(osp.join(work, p)) == t, f"{p} was rewritten"
