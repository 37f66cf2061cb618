"""ImageNet ``.caffemodel`` importer — no Caffe/protobuf-schema dependency.

The reference warm-starts from ``vgg16_20M_mc.caffemodel``
(``run.sh:5``, ``README.md:49``) via ``net.copy_from``.  To read that file
without Caffe we parse the protobuf *wire format* directly with a minimal
reader, extracting per-layer blobs from ``NetParameter``:

  NetParameter: name=1(string), layers=2(repeated V1LayerParameter),
                layer=100(repeated LayerParameter)
  LayerParameter:  name=1, type=2(string),  blobs=7 (repeated BlobProto)
  V1LayerParameter: name=4, type=5(enum),   blobs=6
  BlobProto: num/channels/height/width = 1..4 (int32),
             data=5 (packed float), shape=7 (BlobShape: dim=1 packed int64)

Caffe conv weights are (out, in, kh, kw); flax NHWC kernels are
(kh, kw, in, out).  Channel order stays BGR end-to-end (the data pipeline
feeds BGR exactly like Caffe's, so no swap is needed).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

_WIRE_VARINT = 0
_WIRE_FIXED64 = 1
_WIRE_LEN = 2
_WIRE_FIXED32 = 5


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == _WIRE_FIXED64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == _WIRE_FIXED32:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_floats(val: memoryview, wire: int) -> np.ndarray:
    if wire == _WIRE_LEN:
        return np.frombuffer(bytes(val), dtype="<f4")
    return np.frombuffer(bytes(val), dtype="<f4")  # single fixed32


def _parse_blob(buf: memoryview) -> np.ndarray:
    dims_old = {}
    shape: Optional[List[int]] = None
    data_parts: List[np.ndarray] = []
    for field, wire, val in _iter_fields(buf):
        if field in (1, 2, 3, 4) and wire == _WIRE_VARINT:
            dims_old[field] = val
        elif field == 5:  # data (packed or repeated float)
            data_parts.append(_packed_floats(val, wire))
        elif field == 7 and wire == _WIRE_LEN:  # BlobShape
            shape = []
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    if w2 == _WIRE_LEN:  # packed int64
                        pos = 0
                        while pos < len(v2):
                            d, pos = _read_varint(v2, pos)
                            shape.append(d)
                    else:
                        shape.append(v2)
        elif field == 9 and wire == _WIRE_LEN:  # double_data
            data_parts.append(np.frombuffer(bytes(val), dtype="<f8").astype(np.float32))
    data = np.concatenate(data_parts) if data_parts else np.zeros(0, np.float32)
    if shape is None and dims_old:
        shape = [dims_old.get(i, 1) for i in (1, 2, 3, 4)]
    if shape:
        data = data.reshape(shape)
    return data


def _parse_layer(buf: memoryview, v1: bool) -> Tuple[str, List[np.ndarray]]:
    name_field = 4 if v1 else 1
    blob_field = 6 if v1 else 7
    name = ""
    blobs: List[np.ndarray] = []
    for field, wire, val in _iter_fields(buf):
        if field == name_field and wire == _WIRE_LEN:
            name = bytes(val).decode("utf-8", errors="replace")
        elif field == blob_field and wire == _WIRE_LEN:
            blobs.append(_parse_blob(val))
    return name, blobs


def load_caffemodel(path: str) -> Dict[str, List[np.ndarray]]:
    """Parse a .caffemodel into {layer_name: [blob arrays]} (layers with blobs only)."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    out: Dict[str, List[np.ndarray]] = {}
    for field, wire, val in _iter_fields(buf):
        if wire != _WIRE_LEN:
            continue
        if field in (2, 100):  # layers (V1) / layer
            name, blobs = _parse_layer(val, v1=(field == 2))
            if blobs:
                out[name] = blobs
    return out


def caffe_blobs_to_flax(blobs: Dict[str, List[np.ndarray]], params_template) -> dict:
    """Map caffe layer blobs onto a flax params tree by layer name.

    Conv weights transpose (out, in, kh, kw) -> (kh, kw, in, out); layers
    missing from the caffemodel keep the template's values (net.copy_from
    semantics).  ``fc8`` naming variants across reference snapshots
    ("fc8-SEC_k", "fc8_k") are matched loosely.
    """
    out = {}
    alias = {}
    for name in blobs:
        alias[name] = name
        if name.startswith("fc8") and "-" in name:
            alias[name.replace("fc8-SEC", "fc8")] = name

    for mod_name, leaves in params_template.items():
        src_name = None
        if mod_name in blobs:
            src_name = mod_name
        elif mod_name in alias:
            src_name = alias[mod_name]
        if src_name is None:
            out[mod_name] = leaves
            continue
        bl = blobs[src_name]
        new_leaves = dict(leaves)
        kernel = leaves.get("kernel")
        if kernel is not None and len(bl) >= 1:
            w = bl[0]
            if w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)
            if w.shape == tuple(kernel.shape):
                new_leaves["kernel"] = np.asarray(w, np.float32)
            else:
                print(f"import_caffe: {mod_name} kernel shape {w.shape} != {kernel.shape}, skipping")
        bias = leaves.get("bias")
        if bias is not None and len(bl) >= 2:
            b = bl[1].reshape(-1)
            if b.shape == tuple(bias.shape):
                new_leaves["bias"] = np.asarray(b, np.float32)
            else:
                print(f"import_caffe: {mod_name} bias shape {b.shape} != {bias.shape}, skipping")
        out[mod_name] = new_leaves
    return out
