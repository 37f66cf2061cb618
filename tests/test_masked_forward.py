"""Exact shared-canvas forwards via per-image valid-extent masking.

Contract (``dsrg_tpu/models/masking.py``): a model applied to a zero-packed
static canvas with ``valid_hw`` per-image extents must reproduce — inside
each image's valid score region — the forward of the SAME params at the
image's exact size (the reference's per-shape execution,
``test-ms-f.py:115-130``).  This is what makes the bucketed host path and
the device scales pipeline mIoU-neutral by construction instead of
border-perturbed (VERDICT r3 item 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsrg_tpu.models import DeepLabLargeFOV, ResNet101DeepLab


def _canvas(images):
    ph = max(im.shape[0] for im in images)
    pw = max(im.shape[1] for im in images)
    x = np.zeros((len(images), ph, pw, 3), np.float32)
    dims = np.zeros((len(images), 2), np.float32)
    for i, im in enumerate(images):
        x[i, : im.shape[0], : im.shape[1]] = im
        dims[i] = im.shape[:2]
    return x, dims


# odd/even/8k+1 mixes exercise every branch of the extent propagation
_SIZES = [(41, 41), (33, 47), (38, 44), (48, 35)]


def _check_model(model, variables, images, apply_kw):
    canvas, dims = _canvas(images)
    on_canvas = np.asarray(
        jax.jit(
            lambda v, x, d: model.apply(v, x, valid_hw=d, **apply_kw)
        )(variables, jnp.asarray(canvas), jnp.asarray(dims))
    )
    exact_fwd = jax.jit(lambda v, x: model.apply(v, x, **apply_kw))
    for i, im in enumerate(images):
        exact = np.asarray(exact_fwd(variables, jnp.asarray(im[None])))[0]
        oh, ow = exact.shape[:2]
        got = on_canvas[i, :oh, :ow]
        scale = max(float(np.abs(exact).max()), 1e-3)
        np.testing.assert_allclose(
            got, exact, atol=2e-4 * scale, rtol=0,
            err_msg=f"image {i} {im.shape[:2]} canvas {canvas.shape[1:3]}",
        )


def test_vgg_masked_canvas_matches_exact_size():
    model = DeepLabLargeFOV(num_classes=6, head_dilations=(2, 4))
    rng = np.random.default_rng(0)
    images = [
        rng.normal(size=(h, w, 3)).astype(np.float32) * 40 for h, w in _SIZES
    ]
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(images[0][None]),
        train=False,
    )
    _check_model(model, variables, images, {"train": False})


def test_resnet_masked_canvas_matches_exact_size():
    model = ResNet101DeepLab(
        num_classes=6, head_dilations=(2, 4), stage_blocks=(1, 1, 1, 1)
    )
    rng = np.random.default_rng(1)
    images = [
        rng.normal(size=(h, w, 3)).astype(np.float32) * 40 for h, w in _SIZES
    ]
    variables = model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.asarray(images[0][None]),
        train=False,
    )
    # perturb the BN running stats so masking bugs can't hide behind
    # mean=0/var=1 (fresh-init BN is a no-op)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a, variables
    )
    _check_model(model, variables, images, {"train": False, "train_bn": False})


def test_valid_hw_none_is_plain_forward():
    """valid_hw=None must be bit-identical to the pre-change forward."""
    model = DeepLabLargeFOV(num_classes=4, head_dilations=(2,))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 41, 41, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(2)}, x, train=False)
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False, valid_hw=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_extent_valid_hw_matches_unmasked():
    """Extents covering the whole canvas: masks are all-ones, outputs equal."""
    model = DeepLabLargeFOV(num_classes=4, head_dilations=(2,))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 33, 47, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    a = np.asarray(model.apply(variables, x, train=False))
    b = np.asarray(
        model.apply(
            variables, x, train=False,
            valid_hw=jnp.asarray([[33.0, 47.0]]),
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_device_scales_pipeline_matches_host():
    """End-to-end: the device fractional-scales pipeline (canvas + dynamic
    interp + masked forward) agrees with the serial host path
    (scipy zoom + exact-size forward) — smooth off isolates the forward;
    the masked-canvas CRF already has its own exactness tests."""
    from dsrg_tpu.inference import Predictor

    model = DeepLabLargeFOV(num_classes=6, head_dilations=(2, 4))
    rng = np.random.default_rng(4)
    variables = model.init(
        {"params": jax.random.PRNGKey(4)},
        jnp.zeros((1, 41, 41, 3), jnp.float32), train=False,
    )
    predictor = Predictor(model, variables, num_classes=6)
    images = [
        rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        for h, w in [(61, 81), (73, 57), (81, 81)]
    ]
    scales = [0.75, 1.0, 1.25]
    dev = predictor.predict_masks_device(images, scales=scales, smooth=False)
    agree = []
    for im, dm in zip(images, dev):
        hm = predictor.predict_mask(im, scales=scales, smooth=False)
        agree.append(float((hm == dm).mean()))
    # fp reassociation between scipy zoom and the on-device matmul interp
    # can still flip near-tied argmaxes; structural (border) disagreement
    # is gone, so agreement must be essentially total
    assert np.mean(agree) >= 0.995, agree


def test_bucketed_scores_match_exact():
    """bucket>1 host forwards now mask inside the net: scores equal bucket=1."""
    from dsrg_tpu.inference import Predictor

    model = DeepLabLargeFOV(num_classes=6, head_dilations=(2, 4))
    rng = np.random.default_rng(5)
    variables = model.init(
        {"params": jax.random.PRNGKey(5)},
        jnp.zeros((1, 41, 41, 3), jnp.float32), train=False,
    )
    exact = Predictor(model, variables, num_classes=6, bucket=1)
    bucketed = Predictor(model, variables, num_classes=6, bucket=32)
    im = rng.normal(size=(53, 69, 3)).astype(np.float32) * 40
    a = exact.scores_at_size(im)
    b = bucketed.scores_at_size(im)
    assert a.shape == b.shape
    scale = max(float(np.abs(a).max()), 1e-3)
    np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=0)


def test_masked_pool_input_debug_check(monkeypatch):
    """DSRG_CHECK_MASKING=1 fails loudly on signed max-pool inputs (ADVICE r4):
    masked-canvas exactness requires post-ReLU pool inputs."""
    from dsrg_tpu.models.masking import masked_pool_input

    vh = jnp.asarray([2.0])
    vw = jnp.asarray([2.0])
    pos = jnp.ones((1, 4, 4, 1), jnp.float32)
    neg = pos.at[0, 0, 0, 0].set(-1.0)

    # off by default: signed input passes silently (documented-only invariant)
    monkeypatch.delenv("DSRG_CHECK_MASKING", raising=False)
    masked_pool_input(neg, vh, vw).block_until_ready()

    monkeypatch.setenv("DSRG_CHECK_MASKING", "1")
    out = masked_pool_input(pos, vh, vw)
    jax.effects_barrier()
    assert float(out.sum()) == 4.0
    with pytest.raises(Exception, match="negative|callback"):
        masked_pool_input(neg, vh, vw).block_until_ready()
        jax.effects_barrier()
