import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.ops.pooling import caffe_avg_pool, caffe_max_pool


def test_caffe_max_pool_geometry_chain():
    # the LargeFOV stride chain: 321 -> 161 -> 81 -> 41 -> 41 -> 41
    x = jnp.zeros((1, 321, 321, 1))
    x = caffe_max_pool(x, 3, 2, 1)
    assert x.shape[1] == 161
    x = caffe_max_pool(x, 3, 2, 1)
    assert x.shape[1] == 81
    x = caffe_max_pool(x, 3, 2, 1)
    assert x.shape[1] == 41
    x = caffe_max_pool(x, 3, 1, 1)
    assert x.shape[1] == 41
    x = caffe_avg_pool(x, 3, 1, 1)
    assert x.shape[1] == 41


def test_caffe_max_pool_values():
    # 3x3/2 pad 1 on a 5x5 ramp, hand-checked windows
    v = np.arange(25, dtype=np.float32).reshape(1, 5, 5, 1)
    out = np.asarray(caffe_max_pool(jnp.asarray(v), 3, 2, 1))
    # caffe out size: ceil((5+2-3)/2)+1 = 3
    assert out.shape == (1, 3, 3, 1)
    expect = np.array([[6, 8, 9], [16, 18, 19], [21, 23, 24]], np.float32)
    np.testing.assert_array_equal(out[0, :, :, 0], expect)


def test_max_pool_separable_matches_2d():
    """Separable (1-D col + 1-D row) pooling == the single 2-D reduce_window,
    forward AND backward, exactly.

    The forward factors because max does; the backward matches because both
    route each window's cotangent to the FIRST max in row-major scan order
    (two chained 1-D GE-select scans compose to the 2-D scan order, which is
    also Caffe's stored-argmax backward), so gradients must agree even under
    ties.  Integer-valued inputs/cotangents make every float sum exact, so
    the comparison is bit-level despite accumulation-order differences."""
    from dsrg_tpu.ops.pooling import _max_pool_2d

    rng = np.random.default_rng(7)
    for h, w, stride in [(9, 11, 2), (8, 8, 2), (7, 9, 1), (41, 41, 1)]:
        # small-integer values: tie-heavy (incl. the all-zero ReLU case)
        x = rng.integers(0, 4, size=(2, h, w, 3)).astype(np.float32)
        ct = rng.integers(1, 5, size=caffe_max_pool(jnp.asarray(x), 3, stride, 1).shape).astype(np.float32)

        y_sep = np.asarray(caffe_max_pool(jnp.asarray(x), 3, stride, 1))
        y_2d = np.asarray(_max_pool_2d(jnp.asarray(x), 3, stride, 1))
        np.testing.assert_array_equal(y_sep, y_2d)

        def loss_sep(v):
            return (caffe_max_pool(v, 3, stride, 1) * ct).sum()

        def loss_2d(v):
            return (_max_pool_2d(v, 3, stride, 1) * ct).sum()

        g_sep = np.asarray(jax.grad(loss_sep)(jnp.asarray(x)))
        g_2d = np.asarray(jax.grad(loss_2d)(jnp.asarray(x)))
        np.testing.assert_array_equal(g_sep, g_2d)
        # conservation: every window routes its full cotangent somewhere
        assert g_sep.sum() == ct.sum()


def test_max_pool_separable_bfloat16():
    """The production dtype path: bf16 activations, bf16 cotangents."""
    from dsrg_tpu.ops.pooling import _max_pool_2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 8, size=(2, 13, 13, 4)).astype(np.float32)).astype(jnp.bfloat16)

    def loss_sep(v):
        return caffe_max_pool(v, 3, 2, 1).astype(jnp.float32).sum()

    def loss_2d(v):
        return _max_pool_2d(v, 3, 2, 1).astype(jnp.float32).sum()

    g_sep = np.asarray(jax.grad(loss_sep)(x).astype(jnp.float32))
    g_2d = np.asarray(jax.grad(loss_2d)(x).astype(jnp.float32))
    np.testing.assert_array_equal(g_sep, g_2d)


def test_caffe_avg_pool_divisor_includes_pad():
    # 3x3/1 pad 1: every divisor is 9; sums cover real pixels only
    v = np.ones((1, 4, 4, 1), np.float32)
    out = np.asarray(caffe_avg_pool(jnp.asarray(v), 3, 1, 1))
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(out[0, 0, 0, 0], 4.0 / 9.0, rtol=1e-6)  # corner
    np.testing.assert_allclose(out[0, 1, 1, 0], 1.0, rtol=1e-6)  # interior
    np.testing.assert_allclose(out[0, 0, 1, 0], 6.0 / 9.0, rtol=1e-6)  # edge


def test_model_output_shape_and_determinism():
    model = DeepLabLargeFOV(num_classes=21)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 97, 97, 3))  # 97 -> 13
    variables = model.init({"params": rng}, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 13, 13, 21)
    y2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_model_dropout_active_in_train_mode():
    model = DeepLabLargeFOV(num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 41, 41, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y1 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 0


def test_model_param_names_match_prototxt_layers():
    model = DeepLabLargeFOV()
    x = jnp.zeros((1, 41, 41, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    names = set(params.keys())
    for expected in [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2", "conv5_3",
        "fc6_1", "fc7_1", "fc8-SEC_1", "fc6_4", "fc7_4", "fc8-SEC_4",
    ]:
        assert expected in names, expected
