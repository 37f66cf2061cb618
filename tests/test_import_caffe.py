"""Caffemodel importer test: build a synthetic .caffemodel with an
independent protobuf wire-format *encoder*, then parse it back."""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.models import DeepLabLargeFOV
from dsrg_tpu.models.import_caffe import caffe_blobs_to_flax, load_caffemodel


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _varint_field(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def _blob(arr: np.ndarray, old_style: bool = False) -> bytes:
    data = _len_field(5, arr.astype("<f4").tobytes())
    if old_style:
        dims = list(arr.shape)
        dims = [1] * (4 - len(dims)) + dims
        hdr = b"".join(_varint_field(i + 1, d) for i, d in enumerate(dims))
        return hdr + data
    shape_payload = _len_field(1, b"".join(_varint(d) for d in arr.shape))
    return data + _len_field(7, shape_payload)


def _layer_v2(name: str, blobs) -> bytes:
    payload = _len_field(1, name.encode()) + _len_field(2, b"Convolution")
    for b in blobs:
        payload += _len_field(7, _blob(b))
    return _len_field(100, payload)


def _layer_v1(name: str, blobs) -> bytes:
    payload = _len_field(4, name.encode()) + _varint_field(5, 4)
    for b in blobs:
        payload += _len_field(6, _blob(b, old_style=True))
    return _len_field(2, payload)


def test_load_caffemodel_v1_and_v2(tmp_path):
    rng = np.random.default_rng(0)
    w1 = rng.normal(size=(64, 3, 3, 3)).astype(np.float32)
    b1 = rng.normal(size=(64,)).astype(np.float32)
    w2 = rng.normal(size=(128, 64, 3, 3)).astype(np.float32)
    b2 = rng.normal(size=(128,)).astype(np.float32)

    net = _len_field(1, b"DSRG") + _layer_v2("conv1_1", [w1, b1]) + _layer_v1("conv2_1", [w2, b2])
    path = str(tmp_path / "model.caffemodel")
    open(path, "wb").write(net)

    blobs = load_caffemodel(path)
    assert set(blobs) == {"conv1_1", "conv2_1"}
    np.testing.assert_array_equal(blobs["conv1_1"][0], w1)
    np.testing.assert_array_equal(blobs["conv1_1"][1], b1)
    np.testing.assert_array_equal(blobs["conv2_1"][0], w2)  # old-style 4-dim header
    np.testing.assert_array_equal(blobs["conv2_1"][1].reshape(-1), b2)


def test_caffe_blobs_to_flax_mapping(tmp_path):
    model = DeepLabLargeFOV(num_classes=4, head_dilations=(2,))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 41, 41, 3)), train=False
    )["params"]

    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    net = _layer_v2("conv1_1", [w, b]) + _layer_v2("unknown_layer", [w])
    path = str(tmp_path / "m.caffemodel")
    open(path, "wb").write(net)

    blobs = load_caffemodel(path)
    new_params = caffe_blobs_to_flax(blobs, params)
    # conv1_1 replaced with transposed weights
    np.testing.assert_allclose(
        np.asarray(new_params["conv1_1"]["kernel"]), w.transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(np.asarray(new_params["conv1_1"]["bias"]), b)
    # untouched layers keep the template init
    np.testing.assert_array_equal(
        np.asarray(new_params["conv2_1"]["kernel"]), np.asarray(params["conv2_1"]["kernel"])
    )
