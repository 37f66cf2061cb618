"""Batched inference path: batched probs must equal per-image probs exactly;
batched masked-lattice CRF must agree with the per-image exact engine."""

import numpy as np

import jax
import jax.numpy as jnp

from dsrg_tpu.inference import Predictor
from dsrg_tpu.models import DeepLabLargeFOV


def _predictor(m=6):
    model = DeepLabLargeFOV(num_classes=m, head_dilations=(2, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    return Predictor(model, params, num_classes=m, bucket=1)


def _images(rng, n=3):
    out = []
    for i in range(n):
        h, w = 40 + 7 * i, 52 - 5 * i
        img = np.zeros((h, w, 3), np.uint8)
        img[:, : w // 2] = [200, 60, 50]
        img[:, w // 2 :] = [30, 180, 190]
        img = np.clip(
            img.astype(np.int32) + rng.integers(-8, 8, img.shape), 0, 255
        ).astype(np.uint8)
        out.append(img)
    return out


def test_batched_probs_match_per_image():
    predictor = _predictor()
    rng = np.random.default_rng(0)
    images = _images(rng)
    batched = predictor.predict_probs_batch(images, sizes=[41])
    for im, pb in zip(images, batched):
        ps = predictor.predict_probs(im, sizes=[41])
        np.testing.assert_allclose(pb, ps, rtol=1e-4, atol=1e-5)


def test_batched_masks_nosmooth_match():
    predictor = _predictor()
    rng = np.random.default_rng(1)
    images = _images(rng)
    batched = predictor.predict_masks(images, sizes=[41], smooth=False)
    for im, mb in zip(images, batched):
        ms = predictor.predict_mask(im, sizes=[41], smooth=False)
        np.testing.assert_array_equal(mb, ms)


def test_batched_crf_agrees_with_exact_single():
    predictor = _predictor()
    rng = np.random.default_rng(2)
    images = _images(rng)
    batched = predictor.predict_masks(images, sizes=[41], smooth=True)
    for im, mb in zip(images, batched):
        # per-image path uses the exact N^2 engine at these sizes
        ms = predictor.predict_mask(im, sizes=[41], smooth=True)
        assert mb.shape == ms.shape
        agree = (mb == ms).mean()
        assert agree > 0.95, agree


def test_device_pipeline_matches_serial_nosmooth():
    """predict_masks_device (on-device zoom/fusion/argmax) reproduces the
    serial host pipeline: the dynamic zoom matrices implement the same
    align-corners map as scipy.ndimage.zoom order=1 (test-ms.py:89-110).
    The matmul-form zoom reassociates the two-term lerp, so scores differ at
    ~1e-7 and argmax can flip on exact ties along region boundaries — bound
    the disagreement instead of requiring bit equality."""
    predictor = _predictor()
    rng = np.random.default_rng(3)
    images = _images(rng)
    dev = predictor.predict_masks_device(
        images, sizes=[41, 57], smooth=False, canvas_bucket=16
    )
    for im, md in zip(images, dev):
        ms = predictor.predict_mask(im, sizes=[41, 57], smooth=False)
        agree = (md == ms).mean()
        assert agree > 0.99, agree


def _np_rows(out_cap, in_cap, iv, ov):
    """Independent numpy align-corners interpolation rows (same mapping the
    device pipeline builds in-jit): out i -> in i*(iv-1)/(ov-1), clamped."""
    i = np.arange(out_cap, dtype=np.float64)
    scale = (iv - 1.0) / (ov - 1.0) if ov > 1 else 0.0
    x = np.minimum(i * scale, max(iv - 1.0, 0.0))
    lo = np.clip(np.floor(x), 0, max(iv - 2.0, 0.0)).astype(int)
    frac = (x - lo).astype(np.float32)
    rows = np.zeros((out_cap, in_cap), np.float32)
    rows[np.arange(out_cap), lo] = 1.0 - frac
    rows[np.arange(out_cap), np.minimum(lo + 1, in_cap - 1)] += frac
    return rows


def test_device_pipeline_scales_matches_numpy_oracle():
    """Fractional-scales mode (test-ms-f semantics): each scale forwards on
    a static 8k+1 canvas with a dynamic round(s*dim) valid extent, masked
    INSIDE the net before every spatial op — exact vs running at the scaled
    image's true size (models/masking.py; round-3's border perturbation is
    gone).  The oracle therefore builds each scale with independent numpy
    zoom rows, forwards at the EXACT scaled size, crops the score grid with
    the host rule, and upsamples — validating the dynamic interp + masked
    forward + crop + fusion chain end to end."""
    from dsrg_tpu.data.voc import BGR_MEAN

    predictor = _predictor()
    rng = np.random.default_rng(5)
    images = _images(rng)
    scales = [0.75, 1.0, 1.25]
    dev = predictor.predict_masks_device(
        images, scales=scales, smooth=False, canvas_bucket=16
    )

    for im, md in zip(images, dev):
        h, w = im.shape[:2]
        bgr = im[:, :, ::-1].astype(np.float32) - BGR_MEAN
        scores = 0.0
        for s in scales:
            vh, vw = int(round(s * h)), int(round(s * w))
            rh = _np_rows(vh, h, h, vh)
            rw = _np_rows(vw, w, w, vw)
            t = np.einsum("oh,hwc->owc", rh, bgr)  # (vh, w, 3)
            xs = np.einsum("pw,owc->opc", rw, t)  # (vh, vw, 3)
            sc = np.asarray(
                predictor._fwd(predictor.variables, jnp.asarray(xs[None]))
            )[0].astype(np.float32)
            sv_h, sv_w = (vh - 1) // 8 + 1, (vw - 1) // 8 + 1
            uh = _np_rows(h, sc.shape[0], sv_h, h)
            uw = _np_rows(w, sc.shape[1], sv_w, w)
            up = np.einsum("ph,hwc->pwc", uh, sc)
            up = np.einsum("qw,pwc->pqc", uw, up)
            scores = scores + up
        oracle = scores.argmax(-1).astype(np.uint8)
        assert md.shape == oracle.shape
        agree = (md == oracle).mean()
        assert agree > 0.99, agree


def test_device_pipeline_matches_serial_smooth():
    predictor = _predictor()
    rng = np.random.default_rng(4)
    images = _images(rng)
    dev = predictor.predict_masks_device(
        images, sizes=[41], smooth=True, canvas_bucket=16
    )
    for im, md in zip(images, dev):
        ms = predictor.predict_mask(im, sizes=[41], smooth=True, crf_engine="mmgrid")
        agree = (md == ms).mean()
        assert agree > 0.99, agree


def test_device_pipeline_fuzz_geometries():
    """Randomized image sizes / scale sets / canvas buckets through both
    modes of the device pipeline: guards the score-canvas cap logic (model
    output size under Caffe ceil pooling differs from (s-1)//8+1 off the
    8k+1 grid) and the dynamic valid-extent math for odd geometries."""
    predictor = _predictor()
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(1, 4))
        images = []
        for _ in range(n):
            h = int(rng.integers(21, 70))
            w = int(rng.integers(21, 70))
            images.append(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        bucket = int(rng.choice([8, 16, 32]))
        if trial % 2 == 0:
            sizes = sorted(int(rng.integers(24, 64)) for _ in range(2))
            masks = predictor.predict_masks_device(
                images, sizes=sizes, smooth=False, canvas_bucket=bucket
            )
            # sizes mode is host-path-equivalent at every geometry: oracle-
            # check one image per trial against the serial pipeline (bounded
            # cost — each serial run compiles per shape)
            serial = predictor.predict_mask(images[0], sizes=sizes, smooth=False)
            agree = (masks[0] == serial).mean()
            assert agree > 0.99, (agree, sizes, bucket, images[0].shape)
        else:
            scales = sorted(float(s) for s in rng.uniform(0.6, 1.4, size=2))
            masks = predictor.predict_masks_device(
                images, scales=scales, smooth=False, canvas_bucket=bucket
            )
        for im, mk in zip(images, masks):
            assert mk.shape == im.shape[:2]
            assert mk.dtype == np.uint8
            assert mk.max() < predictor.num_classes


def test_device_pipeline_mesh_dp_matches_single():
    """Data-parallel device pipeline over the 8-device virtual mesh: batch
    sharding splits the per-image work with zero collectives, so masks must
    equal the unsharded run (chunks pad up to a mesh-divisible batch)."""
    from dsrg_tpu.parallel.mesh import make_mesh

    model = DeepLabLargeFOV(num_classes=6, head_dilations=(2, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]
    rng = np.random.default_rng(6)
    images = _images(rng, n=5)  # pads 5 -> 8 on the mesh

    single = Predictor(model, params, num_classes=6)
    sharded = Predictor(model, params, num_classes=6, mesh=make_mesh())
    for kwargs in ({"sizes": [41]}, {"scales": [0.75, 1.0]}):
        want = single.predict_masks_device(
            images, smooth=False, canvas_bucket=16, **kwargs
        )
        got = sharded.predict_masks_device(
            images, smooth=False, canvas_bucket=16, **kwargs
        )
        for w, g in zip(want, got):
            agree = (w == g).mean()
            assert agree > 0.999, agree


def test_device_pipeline_resnet_backbone():
    """The second model family (ResNet-101 DeepLab, BN batch_stats in the
    variables dict) runs through both device-pipeline modes; output caps
    come from the traced score shape, so the stride-8 geometry needs no
    VGG-specific formula."""
    from dsrg_tpu.models import ResNet101DeepLab

    model = ResNet101DeepLab(num_classes=6, stage_blocks=(1, 1, 1, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )
    predictor = Predictor(model, variables, num_classes=6)
    rng = np.random.default_rng(7)
    images = _images(rng, n=2)
    for kwargs in ({"sizes": [41]}, {"scales": [0.75, 1.0]}):
        masks = predictor.predict_masks_device(
            images, smooth=False, canvas_bucket=16, **kwargs
        )
        for im, mk in zip(images, masks):
            assert mk.shape == im.shape[:2]
            assert mk.max() < 6


def test_predict_probs_rejects_sizes_and_scales():
    """Host and device entry points agree: sizes/scales are exclusive."""
    import pytest

    predictor = _predictor()
    im = np.zeros((33, 41, 3), np.uint8)
    with pytest.raises(ValueError, match="exactly one"):
        predictor.predict_probs(im, sizes=[41], scales=[0.75])
    with pytest.raises(ValueError, match="exactly one"):
        predictor.predict_probs_batch([im], sizes=[41], scales=[0.75])


def test_iter_masks_device_depths_match_batched():
    """The streaming iterator equals predict_masks_device at every pipeline
    depth (in_flight 1/2/3), including a tail chunk that does not fill
    ``chunk`` and an image count spanning multiple chunks (VERDICT r4
    item 4: double-buffered uploads/downloads must not reorder or drop
    masks)."""
    predictor = _predictor()
    rng = np.random.default_rng(11)
    images = _images(rng, n=5)  # chunk=2 -> 2 full chunks + 1 tail
    want = predictor.predict_masks_device(
        images, sizes=[41], smooth=False, canvas_bucket=16
    )
    for depth in (1, 2, 3):
        got = list(
            predictor.iter_masks_device(
                iter(images), sizes=[41], chunk=2, smooth=False,
                canvas_bucket=16, in_flight=depth,
            )
        )
        assert len(got) == len(images)
        for (im, mk), im0, w in zip(got, images, want):
            assert im is im0  # images stream through in order
            np.testing.assert_array_equal(mk, w)
