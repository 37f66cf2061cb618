"""Host-RSS watchdog + supervised relaunch (utils/watchdog.py).

Remote-TPU tunnel clients leak host memory per transferred byte (measured:
~6 MB RSS retained per 6.2 MB device_put, native, invisible to
tracemalloc); production-length runs must therefore snapshot-and-restart
before the OOM killer fires.  These tests pin the whole contract: the
trainer exits RESTART_EXIT_CODE with a durable snapshot, resume continues
losslessly, and the recipe driver supervises watchdog exits to completion.
"""

import os.path as osp

import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db
from dsrg_tpu.utils import watchdog


def test_rss_and_limit_resolution():
    # this process certainly holds >10 MB and <10 TB resident
    assert 0.01 < watchdog.rss_gb() < 10_000
    assert watchdog.total_gb() > watchdog.rss_gb() / 1000
    assert watchdog.resolve_limit(0) == 0.0
    assert watchdog.resolve_limit(12.5) == 12.5
    auto = watchdog.resolve_limit(-1)
    assert 0 < auto < watchdog.total_gb()
    assert not watchdog.over_limit(0.0)          # 0 = disarmed
    assert watchdog.over_limit(1e-6)             # far below any real RSS
    assert not watchdog.over_limit(10_000.0)

    # maybe_restart: fires only mid-run with progress banked — each launch
    # must write SOMETHING before a restart, and finishing beats restarting
    with pytest.raises(SystemExit) as exc:
        watchdog.maybe_restart(1e-6, done=1, total=10)
    assert exc.value.code == watchdog.RESTART_EXIT_CODE
    watchdog.maybe_restart(1e-6, done=0, total=10)    # zero progress: no fire
    watchdog.maybe_restart(1e-6, done=10, total=10)   # complete: no fire
    watchdog.maybe_restart(0.0, done=5, total=10)     # disarmed: no fire


def test_stall_watchdog_fires_only_without_ticks():
    """The stall watchdog stays quiet while ticks arrive, fires once the
    tick stream stops for longer than the limit, and never fires after
    close() — the wedged-tunnel escape hatch for supervised phases."""
    import threading
    import time

    fired = threading.Event()

    # disabled: no thread, nothing ever fires
    off = watchdog.StallWatchdog(0.0, on_stall=lambda idle: fired.set())
    assert not hasattr(off, "_thread")

    wd = watchdog.StallWatchdog(0.3, on_stall=lambda idle: fired.set())
    for _ in range(5):                 # ticks keep it quiet past the limit
        time.sleep(0.12)
        wd.tick()
    assert not fired.is_set()
    assert fired.wait(timeout=3.0)     # stop ticking -> fires within ~limit

    fired2 = threading.Event()
    wd2 = watchdog.StallWatchdog(0.2, on_stall=lambda idle: fired2.set())
    wd2.close()                        # closed before the limit elapses
    assert not fired2.wait(timeout=0.6)


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


@pytest.mark.slow
def test_trainer_watchdog_snapshot_exit_and_lossless_resume(voc_tree):
    """A sub-floor RSS limit fires at the first display boundary: the
    trainer persists a full snapshot and raises SystemExit(75); rerunning
    with --auto-resume and the watchdog off completes the run from there."""
    from dsrg_tpu.tools import train as train_tool

    root, lists, base = voc_tree
    snap = str(base / "model-s")
    argv = ["--stage", "s", "--image-dir", str(root / "JPEGImages"),
            "--input-list", str(lists / "input_list.txt"),
            "--cues", str(base / "cues.pickle"),
            "--snapshot-dir", snap, "--max-iter", "3", "--display", "1",
            "--snapshot-every", "3", "--batch-size", "2", "--crop-size", "41",
            "--dtype", "float32"]
    with pytest.raises(SystemExit) as exc:
        train_tool.main(argv + ["--rss-limit-gb", "0.001"])
    assert exc.value.code == watchdog.RESTART_EXIT_CODE
    # the watchdog snapshot is durable before exit
    assert osp.isdir(osp.join(snap, "step_1"))

    train_tool.main(argv + ["--rss-limit-gb", "0", "--auto-resume"])
    assert osp.isdir(osp.join(snap, "step_3"))
    assert osp.isdir(osp.join(snap, "step_3_params"))


@pytest.mark.slow
def test_recipe_supervises_watchdog_exits_to_completion(voc_tree, capfd):
    """End-to-end recipe in the default subprocess mode with an RSS limit
    far below any real process footprint: the dump phases watchdog-exit
    after every chunk and the supervisor relaunches them with
    --skip-existing until every png exists; the result file is produced.
    (Trainers run 1 iter = max_iter, where the watchdog never fires —
    completing beats restarting.)"""
    from dsrg_tpu.tools import run_recipe

    root, lists, base = voc_tree
    work = str(base / "work_wd")
    run_recipe.main([
        "--pascal-dir", str(root), "--list-dir", str(lists),
        "--cues", str(base / "cues.pickle"), "--work-dir", work,
        "--stage1-iters", "1", "--stage2-iters", "1",
        "--batch-size", "2", "--crop-size", "41",
        "--test-sizes", "41", "--test-scales", "1.0",
        "--no-smooth", "--dtype", "float32", "--test-batch", "2",
        "--auto-resume", "--rss-limit-gb", "0.001",
    ])
    result = open(osp.join(work, "DSRG_result_final.txt")).read()
    assert result.startswith("meanIOU: ")
    for i in range(3):
        assert osp.exists(osp.join(work, "DSRGOutput", f"2007_{i:06d}.png"))
        assert osp.exists(osp.join(work, "DSRG_final_output", f"2007_{i:06d}.png"))
    out = capfd.readouterr().out
    assert "rss-watchdog" in out           # phases actually fired the limit
    assert "relaunching with resume" in out  # and the supervisor resumed them
