import os.path as osp

import numpy as np
from PIL import Image

from dsrg_tpu.data.cues import save_cue_db
from dsrg_tpu.tools import ap as ap_tool
from dsrg_tpu.tools import dump_cues


def test_dump_cues_and_ap(tmp_path):
    root = tmp_path
    (root / "JPEGImages").mkdir()
    (root / "gt").mkdir()
    rng = np.random.default_rng(0)
    entries, rows = {}, []
    for i in range(3):
        img_id = f"2007_{i:06d}"
        Image.fromarray(rng.integers(0, 255, (50, 50, 3)).astype(np.uint8)).save(
            root / "JPEGImages" / f"{img_id}.jpg"
        )
        gt = rng.integers(0, 6, (41, 41)).astype(np.uint8)
        Image.fromarray(gt).save(root / "gt" / f"{img_id}.png")
        entries[i] = (
            np.array([2, 4]),
            (rng.integers(0, 6, 5), rng.integers(0, 41, 5), rng.integers(0, 41, 5)),
        )
        rows.append(f"{img_id}.jpg {i}")
    save_cue_db(str(root / "cues.pickle"), entries)
    (root / "input_list.txt").write_text("\n".join(rows) + "\n")
    (root / "ids.txt").write_text("\n".join(r.split()[0][:-4] for r in rows) + "\n")

    out = str(root / "cue_pngs")
    dump_cues.main([
        "--images", str(root / "input_list.txt"), "--dir", str(root),
        "--cues", str(root / "cues.pickle"), "--output", out, "--num-classes", "6",
    ])
    for i in range(3):
        f = osp.join(out, f"2007_{i:06d}_cue.png")
        assert osp.exists(f)
        m = np.asarray(Image.open(f))
        assert m.shape == (41, 41)
        assert set(np.unique(m)).issubset(set(range(6)) | {255})

    # --skip-existing resumes: a relaunch over a complete dump is a no-op
    # (nothing rewritten), the contract the RSS-watchdog supervision uses
    mtimes = {i: osp.getmtime(osp.join(out, f"2007_{i:06d}_cue.png"))
              for i in range(3)}
    dump_cues.main([
        "--images", str(root / "input_list.txt"), "--dir", str(root),
        "--cues", str(root / "cues.pickle"), "--output", out, "--num-classes", "6",
        "--skip-existing",
    ])
    for i, t in mtimes.items():
        assert osp.getmtime(osp.join(out, f"2007_{i:06d}_cue.png")) == t

    save_path = str(root / "ap.txt")
    ap_tool.main([
        "--pred", out, "--gt", str(root / "gt"), "--test_ids", str(root / "ids.txt"),
        "--save_path", save_path, "--class_num", "6",
    ])
    content = open(save_path).read()
    assert "meanIOU:" in content and "mean accuracy:" in content


def test_dump_cues_grow_path(tmp_path):
    """--grow runs the jitted softmax->CRF->region-grow pipeline per image;
    grown cue masks stay valid label maps and keep the original seeds'
    classes present.  (The pipeline MUST be one jit — eager while/fori
    loops dispatch op-by-op, which hangs through remote-TPU tunnels.)"""
    import jax.numpy as jnp

    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.train.checkpoint import save_params

    root = tmp_path
    (root / "JPEGImages").mkdir()
    rng = np.random.default_rng(1)
    entries, rows = {}, []
    for i in range(2):
        img_id = f"2007_{i:06d}"
        Image.fromarray(rng.integers(0, 255, (60, 70, 3)).astype(np.uint8)).save(
            root / "JPEGImages" / f"{img_id}.jpg"
        )
        entries[i] = (
            np.array([2]),
            (np.array([0, 2]), np.array([3, 20]), np.array([4, 21])),
        )
        rows.append(f"{img_id}.jpg {i}")
    save_cue_db(str(root / "cues.pickle"), entries)
    (root / "input_list.txt").write_text("\n".join(rows) + "\n")

    model = DeepLabLargeFOV(num_classes=6)  # load_predictor's default heads
    params = model.init(
        {"params": __import__("jax").random.PRNGKey(0)},
        jnp.zeros((1, 321, 321, 3)), train=False,
    )["params"]
    save_params(str(root / "params"), params)

    out = str(root / "grown")
    dump_cues.main([
        "--images", str(root / "input_list.txt"), "--dir", str(root),
        "--cues", str(root / "cues.pickle"), "--output", out,
        "--num-classes", "6", "--grow", "--model", str(root / "params"),
    ])
    for i in range(2):
        m = np.asarray(Image.open(osp.join(out, f"2007_{i:06d}_cue.png")))
        assert m.shape == (41, 41)
        assert set(np.unique(m)).issubset(set(range(6)) | {255})


def test_generate_train_gt_and_resume(tmp_path):
    """generate_train_gt mirrors the reference tool (forward at 321,
    argmax restricted to the image-level label set + bg) and resumes via
    --skip-existing without rewriting finished masks (the RSS-watchdog
    supervision contract)."""
    import jax
    import jax.numpy as jnp

    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.tools import generate_train_gt
    from dsrg_tpu.train.checkpoint import save_params

    root = tmp_path
    (root / "JPEGImages").mkdir()
    rng = np.random.default_rng(2)
    entries, rows = {}, []
    for i in range(2):
        img_id = f"2007_{i:06d}"
        Image.fromarray(rng.integers(0, 255, (60, 70, 3)).astype(np.uint8)).save(
            root / "JPEGImages" / f"{img_id}.jpg"
        )
        entries[i] = (
            np.array([2, 4]),
            (np.array([0, 2]), np.array([3, 20]), np.array([4, 21])),
        )
        rows.append(f"{img_id}.jpg {i}")
    save_cue_db(str(root / "cues.pickle"), entries)
    (root / "input_list.txt").write_text("\n".join(rows) + "\n")

    model = DeepLabLargeFOV(num_classes=6)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 321, 321, 3)),
        train=False,
    )["params"]
    save_params(str(root / "params"), params)

    out = str(root / "pseudo_gt")
    argv = ["--images", str(root / "input_list.txt"), "--dir", str(root),
            "--model", str(root / "params"), "--cues", str(root / "cues.pickle"),
            "--output", out, "--num-classes", "6"]
    generate_train_gt.main(argv)
    for i in range(2):
        m = np.asarray(Image.open(osp.join(out, f"2007_{i:06d}.png")))
        assert m.shape == (60, 70)
        # restricted argmax: only bg + this image's labels can appear
        assert set(np.unique(m)).issubset({0, 2, 4})

    mtimes = {i: osp.getmtime(osp.join(out, f"2007_{i:06d}.png"))
              for i in range(2)}
    generate_train_gt.main(argv + ["--skip-existing"])
    for i, t in mtimes.items():
        assert osp.getmtime(osp.join(out, f"2007_{i:06d}.png")) == t
