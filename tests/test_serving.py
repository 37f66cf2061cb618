import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.serving import ServingModel, export_deploy


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
