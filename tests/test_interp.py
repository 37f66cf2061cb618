import numpy as np
from scipy.ndimage import zoom as ndzoom

from dsrg_tpu.ops.interp import caffe_interp_out_size, caffe_interp_shrink, zoom_bilinear, zoom_matrix


def test_zoom_matrix_matches_scipy_zoom_order1():
    rng = np.random.default_rng(0)
    for in_s, out_s in [(8, 5), (5, 8), (321, 41), (41, 321), (7, 7)]:
        x = rng.normal(size=(in_s,)).astype(np.float64)
        m = zoom_matrix(in_s, out_s, dtype=np.float64)
        ref = ndzoom(x, out_s / in_s, order=1)
        assert ref.shape[0] == out_s
        np.testing.assert_allclose(m @ x, ref, atol=1e-10)


def test_zoom_bilinear_2d_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 33, 29, 3)).astype(np.float32)
    got = np.asarray(zoom_bilinear(x, 9, 11))
    for i in range(2):
        ref = ndzoom(x[i], (9 / 33, 11 / 29, 1.0), order=1)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_caffe_interp_shrink_is_lossless_subsampling_at_integer_stride():
    assert caffe_interp_out_size(321, 8) == 41
    labels = np.random.default_rng(2).integers(0, 256, size=(1, 321, 321, 1)).astype(np.float32)
    out = np.asarray(caffe_interp_shrink(labels, 8))
    assert out.shape == (1, 41, 41, 1)
    np.testing.assert_array_equal(out, labels[:, ::8, ::8, :])


def test_caffe_interp_shrink_tiny_input_falls_back():
    """H <= shrink_factor used to hit `% (oh-1)` with oh == 1 and crash
    with ZeroDivisionError; it must fall back to the bilinear zoom."""
    import jax.numpy as jnp

    from dsrg_tpu.ops.interp import caffe_interp_shrink

    out = caffe_interp_shrink(jnp.ones((1, 8, 8, 3)), 8)
    assert out.shape == (1, 1, 1, 3)
