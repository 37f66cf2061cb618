"""Multi-host trainer CLI (VERDICT r3 item 3): TWO ``tools/train.py``
processes over localhost jax.distributed must train identically to ONE
process on the same global batch.

Each CLI process exposes 4 virtual CPU devices (8 global — the same mesh
size as this pytest process), loads only its own contiguous slice of the
global data order (``_EpochOrder.configure_shard``), assembles global
batches via ``shard_global_batch``, and psum-reduces over the global mesh.
Global batch 8 puts sample i on global device i in both topologies, so even
the per-device augmentation RNG matches and the per-iteration losses must
agree to float tolerance.  Snapshots exercise orbax's multi-process save.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_train_cli_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def tiny_voc(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids, entries = [], {}
    for i in range(8):
        img_id = f"2007_{i:06d}"
        ids.append(img_id)
        arr = rng.integers(0, 255, (45, 55, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
        entries[i] = (
            np.array([2, 5]),
            (rng.integers(0, 3, 6) * 2, rng.integers(0, 6, 6), rng.integers(0, 6, 6)),
        )
    save_cue_db(str(root / "cues.pickle"), entries)
    with open(root / "input_list.txt", "w") as f:
        for i, img_id in enumerate(ids):
            f.write(f"{img_id}.jpg {i}\n")
    return root


def _base_argv(root, snap_dir, metrics):
    return [
        "--stage", "s",
        "--image-dir", str(root / "JPEGImages"),
        "--input-list", str(root / "input_list.txt"),
        "--cues", str(root / "cues.pickle"),
        "--snapshot-dir", snap_dir,
        "--max-iter", "3", "--batch-size", "8", "--crop-size", "41",
        "--snapshot-every", "3", "--display", "1",
        "--sync-snapshots",
        "--metrics-log", metrics,
    ]


def _read_losses(metrics_path):
    with open(metrics_path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    return {r["step"]: r["loss"] for r in rows if "loss" in r}


def test_two_process_trainer_cli_matches_single_process(tiny_voc, tmp_path):
    root = tiny_voc

    # reference: single process, 8-device mesh (this pytest interpreter)
    from dsrg_tpu.tools import train as train_tool

    single_metrics = str(tmp_path / "single.jsonl")
    train_tool.main(_base_argv(root, str(tmp_path / "m_single"), single_metrics))
    single = _read_losses(single_metrics)
    assert set(single) == {1, 2, 3}

    # 2-process multi-host job through the real CLI entry point
    port = _free_port()
    coord = f"localhost:{port}"
    multi_metrics = str(tmp_path / "multi.jsonl")
    snap_dir = str(tmp_path / "m_multi")
    procs = []
    for pid in range(2):
        argv = _base_argv(root, snap_dir, multi_metrics) + [
            "--coordinator", coord,
            "--num-processes", "2",
            "--process-id", str(pid),
        ]
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, "4"] + argv,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
        )
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"trainer process {pid} failed:\n{out}"
    assert "across 2 processes" in outs[0]

    multi = _read_losses(multi_metrics)  # written by the primary only
    assert set(multi) == {1, 2, 3}
    for it in (1, 2, 3):
        np.testing.assert_allclose(multi[it], single[it], rtol=1e-5)

    # the multi-process job snapshots once (orbax multi-process save)
    assert osp.exists(osp.join(snap_dir, "step_3_params"))


def test_eight_process_uneven_batch20_matches_single_process(tiny_voc, tmp_path):
    """VERDICT r4 item 3: the reference's global batch 20
    (train-s.prototxt:17-19) on a process count that does NOT divide it —
    8 single-device localhost processes (the v5p pod-slice host shape).
    The padded global batch is 24 rows / 3 per process; process 6 carries
    2 real + 1 pad row and process 7 is ALL padding (it loads one masked
    replica of global row 19).  Per-iteration losses must equal the
    single-process 8-virtual-device run bit-for-bit-to-float-tolerance:
    the process tiling reproduces the single-process padded layout exactly
    (same rows on the same mesh positions, same per-device RNG folds)."""
    root = tiny_voc

    def argv20(snap, metrics):
        return [
            "--stage", "s",
            "--image-dir", str(root / "JPEGImages"),
            "--input-list", str(root / "input_list.txt"),
            "--cues", str(root / "cues.pickle"),
            "--snapshot-dir", snap,
            "--max-iter", "2", "--batch-size", "20", "--crop-size", "41",
            "--snapshot-every", "2", "--display", "1",
            "--sync-snapshots",
            "--metrics-log", metrics,
        ]

    # reference: single process, 8-device mesh (this pytest interpreter)
    from dsrg_tpu.tools import train as train_tool

    single_metrics = str(tmp_path / "single20.jsonl")
    train_tool.main(argv20(str(tmp_path / "m_single20"), single_metrics))
    single = _read_losses(single_metrics)
    assert set(single) == {1, 2}

    port = _free_port()
    coord = f"localhost:{port}"
    multi_metrics = str(tmp_path / "multi20.jsonl")
    snap_dir = str(tmp_path / "m_multi20")
    procs = []
    for pid in range(8):
        argv = argv20(snap_dir, multi_metrics) + [
            "--coordinator", coord,
            "--num-processes", "8",
            "--process-id", str(pid),
        ]
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, "1"] + argv,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
        )
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"trainer process {pid} failed:\n{out}"
    assert "across 8 processes" in outs[0]
    assert "batch padded 20->24" in outs[0]

    multi = _read_losses(multi_metrics)
    assert set(multi) == {1, 2}
    for it in (1, 2):
        np.testing.assert_allclose(multi[it], single[it], rtol=1e-5)
