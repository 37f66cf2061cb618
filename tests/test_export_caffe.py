"""Caffemodel EXPORT path (models/export_caffe): flax -> wire -> import must
round-trip bit-exactly for both model families.  This is the foundation of
the ResNet warm-start contract proof: ``tools/calibrate_bn.py`` writes
calibrated BN stats through this writer and the trainer re-imports them
through the REAL ``--weights *.caffemodel`` path."""

import numpy as np

import jax
import jax.numpy as jnp

from dsrg_tpu.models import DeepLabLargeFOV, ResNet101DeepLab
from dsrg_tpu.models.export_caffe import (
    resnet_variables_to_blobs,
    vgg_params_to_blobs,
    write_caffemodel,
)
from dsrg_tpu.models.import_caffe import (
    caffe_blobs_to_flax,
    load_caffemodel,
    resnet_blobs_to_flax,
)

STAGE_BLOCKS = (1, 1, 2, 1)  # covers the a/b1 block-letter numbering


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for p, v in fa:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fb[jax.tree_util.keystr(p)]),
            rtol=0, atol=0, err_msg=jax.tree_util.keystr(p),
        )


def test_resnet_export_import_roundtrip(tmp_path):
    model = ResNet101DeepLab(num_classes=4, stage_blocks=STAGE_BLOCKS,
                             head_dilations=(2, 4))
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 33, 33, 3)), train=False)

    # perturb the stats so the round trip cannot pass on identity inits
    nrng = np.random.default_rng(1)
    variables = jax.tree.map(
        lambda v: jnp.asarray(
            np.asarray(v) + nrng.normal(size=np.shape(v)).astype(np.float32) * 0.1
        ),
        variables,
    )

    path = str(tmp_path / "resnet_export.caffemodel")
    write_caffemodel(path, resnet_variables_to_blobs(variables, STAGE_BLOCKS))

    template = model.init({"params": jax.random.PRNGKey(7)},
                          jnp.zeros((1, 33, 33, 3)), train=False)
    back = resnet_blobs_to_flax(load_caffemodel(path), template, STAGE_BLOCKS)
    _tree_equal(variables["params"], back["params"])
    _tree_equal(variables["batch_stats"], back["batch_stats"])


def test_vgg_export_import_roundtrip(tmp_path):
    model = DeepLabLargeFOV(num_classes=4, head_dilations=(2, 4))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 41, 41, 3)), train=False)["params"]
    path = str(tmp_path / "vgg_export.caffemodel")
    write_caffemodel(path, vgg_params_to_blobs(params))
    template = model.init({"params": jax.random.PRNGKey(3)},
                          jnp.zeros((1, 41, 41, 3)), train=False)["params"]
    back = caffe_blobs_to_flax(load_caffemodel(path), template)
    _tree_equal(params, back)


def test_calibration_moves_stats_and_survives_roundtrip(tmp_path):
    """Mini precise-BN calibration on the tiny ResNet: train-BN forwards
    accumulate non-identity running stats; export -> import preserves them."""
    model = ResNet101DeepLab(num_classes=4, stage_blocks=STAGE_BLOCKS,
                             head_dilations=(2,))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 33, 33, 3)), train=False)
    params, stats = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)

    @jax.jit
    def calib(params, stats, x):
        _, mut = model.apply({"params": params, "batch_stats": stats},
                             x, train=False, train_bn=True,
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    for _ in range(3):
        x = jnp.asarray(rng.normal(size=(2, 33, 33, 3)).astype(np.float32) * 40)
        stats = calib(params, stats, x)
    assert float(np.abs(np.asarray(stats["bn1"]["mean"])).mean()) > 0

    path = str(tmp_path / "calib.caffemodel")
    write_caffemodel(
        path, resnet_variables_to_blobs({"params": params, "batch_stats": stats},
                                        STAGE_BLOCKS)
    )
    template = model.init({"params": jax.random.PRNGKey(9)},
                          jnp.zeros((1, 33, 33, 3)), train=False)
    back = resnet_blobs_to_flax(load_caffemodel(path), template, STAGE_BLOCKS)
    _tree_equal(stats, back["batch_stats"])
