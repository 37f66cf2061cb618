"""Checkpoint topology portability (VERDICT r3 item 8).

The reference's restore contract (``solver.restore``, ``train.py:57-58``)
generalized to meshes: a snapshot saved under a SINGLE-device run must
restore into an 8-device DP run (and the reverse) and continue bit-identically
to the same run without the save/restore round-trip.  This is load-bearing
the moment production runs move between one chip and a v5p-8: `--auto-resume`
must not care what topology wrote the snapshot.

Mirror/dropout stay off: the comparison isolates the checkpoint round-trip
(the with-/without-round-trip runs share every RNG draw either way).
"""

import jax
import numpy as np
import pytest

from dsrg_tpu.config import Stage1Config
from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    replicate_to_mesh,
    shard_batch,
)
from dsrg_tpu.train import checkpoint as ckpt
from dsrg_tpu.train.stage1 import init_stage1, make_stage1_step

pytestmark = pytest.mark.slow


def _setup():
    cfg = Stage1Config(
        batch_size=8, crop_size=41, cue_size=6, num_classes=5,
        crf_iters=2, mirror=False,
    )
    model = DeepLabLargeFOV(num_classes=5, head_dilations=(2, 4), dropout_rate=0.0)
    state, tx, _ = init_stage1(model, cfg)
    rng = np.random.default_rng(0)
    labels = np.zeros((8, 5), np.float32)
    labels[:, 0] = labels[:, 3] = 1.0
    batch = {
        "images": rng.normal(size=(8, 41, 41, 3)).astype(np.float32) * 20,
        "labels": labels,
        "cues": (rng.uniform(size=(8, 6, 6, 5)) < 0.1).astype(np.float32)
        * labels[:, None, None, :],
    }
    single = jax.jit(make_stage1_step(model, cfg, tx))
    mesh = make_mesh()
    dp = data_parallel_step(
        make_stage1_step(model, cfg, tx, axis_name="data"), mesh, donate_state=False
    )
    return state, batch, single, dp, mesh


def _assert_states_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(a.opt_state),
                    jax.tree_util.tree_leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(a.step) == int(b.step)


def test_single_device_snapshot_restores_into_mesh_run(tmp_path):
    state, batch, single, dp, mesh = _setup()
    sharded = shard_batch(batch, mesh)

    # 2 single-device steps, snapshot, continue 1 DP step after restore
    s = state
    for _ in range(2):
        s, _ = single(s, batch)
    path = ckpt.save_checkpoint(str(tmp_path / "ckpt_single"), s, int(s.step))
    restored = ckpt.restore_checkpoint(path, state)  # fresh-init template
    restored = replicate_to_mesh(restored, mesh)  # exactly what tools/train.py does
    cont_restored, _ = dp(restored, sharded)

    # the same run without the round-trip
    cont_direct, _ = dp(s, sharded)
    _assert_states_equal(cont_restored, cont_direct)


def test_mesh_snapshot_restores_into_single_device_run(tmp_path):
    state, batch, single, dp, mesh = _setup()
    sharded = shard_batch(batch, mesh)

    s = state
    for _ in range(2):
        s, _ = dp(s, sharded)
    path = ckpt.save_checkpoint(str(tmp_path / "ckpt_mesh"), s, int(s.step))
    restored = ckpt.restore_checkpoint(path, state)
    cont_restored, _ = single(restored, batch)

    cont_direct, _ = single(s, batch)
    _assert_states_equal(cont_restored, cont_direct)
