import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.serving import ServingModel, export_deploy

import pytest

# e2e/subprocess/distributed tier (VERDICT r2 item 6): excluded from the
# fast core gate via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


def test_export_and_serve_roundtrip(tmp_path):
    model = DeepLabLargeFOV(num_classes=5, head_dilations=(2, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 41, 41, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    path = str(tmp_path / "deploy.stablehlo")
    export_deploy(model, variables, path, input_shape=(1, 41, 41, 3))

    served = ServingModel(path)
    assert served.input_shape == (1, 41, 41, 3)
    out = served(np.asarray(x))
    ref = np.asarray(model.apply(variables, x, train=False))
    e = np.exp(ref - ref.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True) + 1e-4
    p = p / p.sum(-1, keepdims=True)
    np.testing.assert_allclose(out, p, rtol=1e-4, atol=1e-5)


def test_export_pipeline_roundtrip(tmp_path):
    """The full multi-scale+CRF pipeline artifact reproduces
    Predictor.predict_masks_device exactly (same program, same inputs)."""
    from dsrg_tpu.inference import Predictor
    from dsrg_tpu.serving import ServingPipeline, export_pipeline

    model = DeepLabLargeFOV(num_classes=5, head_dilations=(2, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )

    rng = np.random.default_rng(0)
    images = []
    for i in range(3):
        h, w = 40 + 5 * i, 52 - 4 * i
        img = np.zeros((h, w, 3), np.uint8)
        img[:, : w // 2] = [200, 60, 50]
        img[:, w // 2 :] = [30, 180, 190]
        images.append(
            np.clip(img.astype(np.int32) + rng.integers(-8, 8, img.shape), 0, 255)
            .astype(np.uint8)
        )

    path = str(tmp_path / "pipeline.stablehlo")
    export_pipeline(
        model, variables, path, canvas_hw=(64, 64), batch=2,
        sizes=(41,), smooth=True, num_classes=5,
    )
    served = ServingPipeline(path)
    got = served(images)  # 3 images through an exported batch of 2

    pred = Predictor(model, variables, num_classes=5)
    # same canvas the artifact was exported with
    want2 = pred.predict_masks_device(images[:2], sizes=[41], smooth=True,
                                      canvas_bucket=64)
    want1 = pred.predict_masks_device(images[2:], sizes=[41], smooth=True,
                                      canvas_bucket=64)
    for g, w in zip(got, want2 + want1):
        assert g.shape == w.shape
        agree = (g == w).mean()
        assert agree > 0.999, agree


def test_export_cli(tmp_path):
    from dsrg_tpu.tools import export as export_tool
    from dsrg_tpu.train.checkpoint import save_params
    from dsrg_tpu.serving import ServingPipeline

    model = DeepLabLargeFOV(num_classes=21)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    params_path = str(tmp_path / "params")
    save_params(params_path, params)
    out = str(tmp_path / "pipe.stablehlo")
    export_tool.main([
        "--model", params_path, "--output", out,
        "--mode", "pipeline", "--batch", "2", "--canvas", "64", "64",
        "--sizes", "41", "--no-smooth",
    ])
    served = ServingPipeline(out)
    img = np.zeros((48, 60, 3), np.uint8)
    masks = served([img])
    assert masks[0].shape == (48, 60) and masks[0].max() < 21
