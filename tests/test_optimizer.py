import jax
import jax.numpy as jnp
import numpy as np
import optax

from dsrg_tpu.train.optimizer import caffe_sgd, lr_poly, lr_step, vgg_param_mults


def test_lr_schedules():
    step = lr_step(5e-4, 0.33, 1000)
    np.testing.assert_allclose(float(step(0)), 5e-4)
    np.testing.assert_allclose(float(step(999)), 5e-4)
    np.testing.assert_allclose(float(step(1000)), 5e-4 * 0.33, rtol=1e-6)
    np.testing.assert_allclose(float(step(2500)), 5e-4 * 0.33**2, rtol=1e-6)
    poly = lr_poly(1e-3, 0.9, 20000)
    np.testing.assert_allclose(float(poly(0)), 1e-3)
    np.testing.assert_allclose(float(poly(10000)), 1e-3 * 0.5**0.9, rtol=1e-6)


def test_vgg_param_mults():
    params = {
        "conv1_1": {"kernel": jnp.zeros((3, 3, 3, 4)), "bias": jnp.zeros(4)},
        "fc8-SEC_1": {"kernel": jnp.zeros((1, 1, 4, 2)), "bias": jnp.zeros(2)},
    }
    lr, dec = vgg_param_mults(params)
    assert lr["conv1_1"]["kernel"] == 1.0 and lr["conv1_1"]["bias"] == 2.0
    assert lr["fc8-SEC_1"]["kernel"] == 10.0 and lr["fc8-SEC_1"]["bias"] == 20.0
    assert dec["conv1_1"]["kernel"] == 1.0 and dec["conv1_1"]["bias"] == 0.0
    assert dec["fc8-SEC_1"]["bias"] == 0.0


def test_caffe_sgd_update_sequence():
    """Two manual Caffe-SGD steps, checked against a hand computation."""
    base_lr, mom, wd = 0.1, 0.9, 0.01
    params = {"layer": {"kernel": jnp.asarray([2.0]), "bias": jnp.asarray([1.0])}}
    tx = caffe_sgd(lambda s: base_lr, momentum=mom, weight_decay=wd)
    state = tx.init(params)
    g = {"layer": {"kernel": jnp.asarray([0.5]), "bias": jnp.asarray([0.25])}}

    updates, state = tx.update(g, state, params)
    params = optax.apply_updates(params, updates)
    # kernel: lr_mult 1, decay 1: v = 0.1*(0.5 + 0.01*2) = 0.052; w = 2-0.052
    np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]), [2 - 0.052], rtol=1e-6)
    # bias: lr_mult 2, decay 0: v = 0.2*0.25 = 0.05; w = 1-0.05
    np.testing.assert_allclose(np.asarray(params["layer"]["bias"]), [0.95], rtol=1e-6)

    updates, state = tx.update(g, state, params)
    params = optax.apply_updates(params, updates)
    # kernel: v = 0.9*0.052 + 0.1*(0.5+0.01*1.948) = 0.0468+0.0519 = 0.098748
    expect_v = 0.9 * 0.052 + 0.1 * (0.5 + 0.01 * 1.948)
    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), [2 - 0.052 - expect_v], rtol=1e-6
    )


def test_clip_gradients_matches_caffe_order():
    """Caffe's SGDSolver::ClipGradients scales RAW grads by thresh/norm
    BEFORE weight decay is added — check exactly that order, and that a
    below-threshold norm is untouched."""
    base_lr, mom, wd, clip = 0.1, 0.9, 0.01, 0.25
    params = {"layer": {"kernel": jnp.asarray([2.0]), "bias": jnp.asarray([1.0])}}
    tx = caffe_sgd(lambda s: base_lr, momentum=mom, weight_decay=wd,
                   clip_gradients=clip)
    state = tx.init(params)
    g = {"layer": {"kernel": jnp.asarray([0.4]), "bias": jnp.asarray([0.3])}}
    gnorm = np.sqrt(0.4**2 + 0.3**2)  # 0.5 > clip
    scale = clip / gnorm

    updates, state = tx.update(g, state, params)
    params = optax.apply_updates(params, updates)
    # kernel: clip first, THEN decay: v = lr*(0.4*scale + wd*2)
    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]),
        [2 - base_lr * (0.4 * scale + wd * 2.0)], rtol=1e-6)
    # bias: lr_mult 2, no decay: v = 2*lr*0.3*scale
    np.testing.assert_allclose(
        np.asarray(params["layer"]["bias"]),
        [1 - 2 * base_lr * 0.3 * scale], rtol=1e-6)

    # small grads pass through unscaled (norm 0.05 < 0.25)
    g_small = {"layer": {"kernel": jnp.asarray([0.04]), "bias": jnp.asarray([0.03])}}
    tx2 = caffe_sgd(lambda s: base_lr, momentum=mom, weight_decay=0.0,
                    clip_gradients=clip)
    u_clip, _ = tx2.update(g_small, tx2.init(params), params)
    tx3 = caffe_sgd(lambda s: base_lr, momentum=mom, weight_decay=0.0)
    u_ref, _ = tx3.update(g_small, tx3.init(params), params)
    np.testing.assert_allclose(np.asarray(u_clip["layer"]["kernel"]),
                               np.asarray(u_ref["layer"]["kernel"]), rtol=1e-7)


def test_bn_and_resnet_head_mults():
    params = {
        "bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "res2_0": {"conv1": {"kernel": jnp.zeros((1, 1, 4, 4))},
                   "bn2": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}},
        "fc1_voc12_c1": {"kernel": jnp.zeros((3, 3, 4, 2)), "bias": jnp.zeros(2)},
    }
    lr, dec = vgg_param_mults(params)
    assert lr["bn1"]["scale"] == 0.0 and lr["bn1"]["bias"] == 0.0  # frozen BN
    assert dec["res2_0"]["bn2"]["scale"] == 0.0
    assert lr["res2_0"]["conv1"]["kernel"] == 1.0
    assert lr["fc1_voc12_c1"]["kernel"] == 10.0 and lr["fc1_voc12_c1"]["bias"] == 20.0
