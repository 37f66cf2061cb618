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


def test_caffe_dropout_bits8_statistics_and_scale():
    from dsrg_tpu.ops.dropout import CaffeDropout

    x = jnp.ones((64, 41, 41, 16), jnp.float32)
    drop = CaffeDropout(0.5, bits8=True)
    y = drop.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    # kept units are scaled by exactly 1/(1-0.5); dropped are exactly 0
    assert set(np.unique(y)) == {0.0, 2.0}
    # keep rate is Bernoulli(0.5): ~5 sigma bound on the mean over 1.7M draws
    keep = (y > 0).mean()
    assert abs(keep - 0.5) < 5 * 0.5 / np.sqrt(y.size)
    # E[y] == x (inverted dropout)
    assert abs(y.mean() - 1.0) < 5e-3
    # deterministic passthrough, no rng needed
    np.testing.assert_array_equal(
        np.asarray(drop.apply({}, x, deterministic=True)), np.asarray(x))


def test_caffe_dropout_bits32_path_is_inverted_bernoulli():
    from dsrg_tpu.ops.dropout import CaffeDropout

    # bits8=False delegates to flax nn.Dropout's 32-bit mask construction
    # (the rng differs from a bare nn.Dropout only via the module path fold)
    x = jnp.ones((32, 32, 32), jnp.float32)
    y = np.asarray(CaffeDropout(0.5, bits8=False).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)}))
    assert set(np.unique(y)) == {0.0, 2.0}
    assert abs((y > 0).mean() - 0.5) < 5 * 0.5 / np.sqrt(y.size)


def test_caffe_dropout_bits8_gradient_routes_through_mask():
    from dsrg_tpu.ops.dropout import CaffeDropout

    x = jnp.ones((4, 16, 16, 8), jnp.float32)
    drop = CaffeDropout(0.5, bits8=True)

    def f(x):
        return drop.apply({}, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(3)}).sum()

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(drop.apply({}, x, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(3)}))
    # gradient is the mask * scale — nonzero exactly where the output is
    np.testing.assert_array_equal(g != 0, y != 0)
    assert set(np.unique(g)) <= {0.0, 2.0}


def test_max_pool_routed_grad_matches_select_and_scatter():
    """The routed elementwise backward of ops/pooling._max_pool_1d (kept as
    the semantic spec for a future Pallas pool-grad kernel; NOT the
    production path — see its docstring) routes every window's cotangent to
    the window's first maximum, exactly like SelectAndScatter.  Integer data
    makes the accumulation exact, so the match is bit-level incl. ties; on
    float data only the accumulation order differs (allclose)."""
    from dsrg_tpu.ops.pooling import _caffe_pool_geometry, _max_pool_1d, _max_pool_2d

    def routed_pool(x, k, s, p):
        h, w = x.shape[1], x.shape[2]
        _, ph = _caffe_pool_geometry(h, k, s, p)
        _, pw = _caffe_pool_geometry(w, k, s, p)
        y = _max_pool_1d(x, 2, k, s, tuple(pw))
        return _max_pool_1d(y, 1, k, s, tuple(ph))

    rng = np.random.default_rng(11)
    for h, w, stride in [(41, 41, 1), (21, 33, 2), (9, 11, 2)]:
        # tie-heavy integer case: bit-level
        x = jnp.asarray(rng.integers(0, 4, size=(2, h, w, 3)).astype(np.float32))
        ct = jnp.asarray(rng.integers(
            1, 5, size=caffe_max_pool(x, 3, stride, 1).shape).astype(np.float32))
        g_new = np.asarray(jax.grad(
            lambda v: (routed_pool(v, 3, stride, 1) * ct).sum())(x))
        g_ref = np.asarray(jax.grad(
            lambda v: (caffe_max_pool(v, 3, stride, 1) * ct).sum())(x))
        np.testing.assert_array_equal(g_new, g_ref)
        # float case: identical support, reassociated accumulation
        xf = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        cf = jnp.asarray(rng.normal(size=ct.shape).astype(np.float32))
        g_new = np.asarray(jax.grad(
            lambda v: (routed_pool(v, 3, stride, 1) * cf).sum())(xf))
        g_sas = np.asarray(jax.grad(
            lambda v: (_max_pool_2d(v, 3, stride, 1) * cf).sum())(xf))
        np.testing.assert_array_equal(g_new != 0, g_sas != 0)
        np.testing.assert_allclose(g_new, g_sas, rtol=1e-4, atol=1e-6)
