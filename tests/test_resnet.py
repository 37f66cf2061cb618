import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.models import ResNet101DeepLab


def _tiny():
    # 2 blocks/stage to keep CPU test time sane; geometry identical
    return ResNet101DeepLab(num_classes=7, stage_blocks=(1, 1, 1, 1))


def test_resnet_output_stride_8():
    model = _tiny()
    x = jnp.zeros((1, 97, 97, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = model.apply(variables, x, train=False)
    # 97 -> conv1/2 -> 49 -> pool/2 -> 25 -> res3/2 -> 13
    assert y.shape == (1, 13, 13, 7)


def test_resnet_batchnorm_frozen_stats_deterministic():
    model = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 65, 65, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "batch_stats" in variables
    y1 = model.apply(variables, x, train=True)  # frozen BN: no mutable needed
    y2 = model.apply(variables, x, train=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_resnet_gradients_flow():
    model = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 33, 33, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(p):
        return (model.apply({"params": p, "batch_stats": variables["batch_stats"]}, x) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in flat)
