"""Worker process for the 2-process jax.distributed CPU test.

Run as: python tests/_distributed_worker.py <coordinator> <num_procs> <pid>
Each process exposes 4 virtual CPU devices -> 8 global devices.  Builds the
slice-contiguous global mesh, shards a deterministic global batch by
``local_batch_slice``, runs ONE stage-1 DP step, prints the replicated loss.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from dsrg_tpu.parallel.distributed import (
        initialize,
        local_batch_slice,
        make_global_mesh,
    )

    initialize(coordinator_address=coordinator, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert jax.device_count() == 4 * n_proc, jax.device_count()

    mesh = make_global_mesh()
    assert mesh.devices.size == 4 * n_proc

    from dsrg_tpu.config import Stage1Config
    from dsrg_tpu.models import DeepLabLargeFOV
    from dsrg_tpu.parallel import data_parallel_step, shard_global_batch
    from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step

    global_batch = 4 * n_proc
    # geometry via env so the slow production-geometry test (321^2 x 21,
    # full CRF) reuses this worker; defaults = fast toy geometry
    crop = int(os.environ.get("DSRG_DIST_CROP", "41"))
    ncls = int(os.environ.get("DSRG_DIST_CLASSES", "6"))
    crf_iters = int(os.environ.get("DSRG_DIST_CRF_ITERS", "2"))
    cfg = Stage1Config(
        batch_size=global_batch, crop_size=crop, cue_size=(crop - 1) // 8 + 1,
        num_classes=ncls, crf_iters=crf_iters,
    )
    dil = (2, 4) if crop <= 64 else (6, 12, 18, 24)
    model = DeepLabLargeFOV(num_classes=cfg.num_classes, head_dilations=dil)
    state, tx, _ = init_stage1(model, cfg)
    step = data_parallel_step(
        make_stage1_step(model, cfg, tx, axis_name="data"), mesh, donate_state=False
    )

    # deterministic GLOBAL batch built identically on every process
    rng = np.random.default_rng(0)
    labels = np.zeros((global_batch, cfg.num_classes), np.float32)
    labels[:, 0] = 1.0
    labels[:, 2] = 1.0
    cs = cfg.cue_size
    full = {
        "images": rng.normal(size=(global_batch, crop, crop, 3)).astype(np.float32) * 30,
        "labels": labels,
        "cues": (
            rng.uniform(size=(global_batch, cs, cs, cfg.num_classes)) < 0.1
        ).astype(np.float32)
        * labels[:, None, None, :],
    }
    sl = local_batch_slice(global_batch)
    local = {k: v[sl] for k, v in full.items()}
    batch = shard_global_batch(local, mesh)

    _, metrics = step(state, batch)
    loss = float(metrics["loss"])  # out_specs P() -> fully replicated
    assert np.isfinite(loss), loss
    print(f"WORKER{pid} loss={loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
