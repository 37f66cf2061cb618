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


def _caffe_block_names(n_blocks: int) -> List[str]:
    """DeepLab-v2 ResNet block suffixes: 3-block stages use a/b/c, longer
    stages a/b1/b2/... (res3a..res3b3, res4a..res4b22)."""
    if n_blocks <= 3:
        return ["abc"[i] for i in range(n_blocks)]
    return ["a"] + [f"b{i}" for i in range(1, n_blocks)]


def resnet_blobs_to_flax(
    blobs: Dict[str, List[np.ndarray]],
    variables_template,
    stage_blocks=(3, 4, 23, 3),
) -> dict:
    """Map a DeepLab-v2 ResNet-101 caffemodel onto the flax variables tree.

    Caffe naming (deeplab ResNet prototxts): convs ``conv1`` /
    ``res{S}{blk}_branch2{a,b,c}`` / ``res{S}{blk}_branch1`` (projection);
    BatchNorm layers ``bn_conv1`` / ``bn{S}{blk}_branch2{a,b,c}`` with blobs
    [mean*sf, var*sf, sf]; Scale layers ``scale_conv1`` /
    ``scale{S}{blk}_...`` with blobs [gamma, beta]; ASPP heads
    ``fc1_voc12_c0..c3``.  Missing layers keep template values
    (``net.copy_from`` semantics).  Returns a full variables dict
    ({"params", "batch_stats"}).
    """
    import copy

    params = copy.deepcopy(
        {k: dict(v) if isinstance(v, dict) else v for k, v in variables_template["params"].items()}
    )
    stats = copy.deepcopy(
        {k: dict(v) if isinstance(v, dict) else v for k, v in variables_template["batch_stats"].items()}
    )

    def set_conv(flax_mod: dict, caffe_name: str) -> None:
        if caffe_name not in blobs:
            return
        bl = blobs[caffe_name]
        w = bl[0]
        if w.ndim == 4:
            w = w.transpose(2, 3, 1, 0)
        if "kernel" in flax_mod and w.shape == tuple(np.shape(flax_mod["kernel"])):
            flax_mod["kernel"] = np.asarray(w, np.float32)
        else:
            print(f"import_caffe: resnet {caffe_name} kernel shape mismatch, skipping")
        if "bias" in flax_mod and len(bl) >= 2:
            flax_mod["bias"] = np.asarray(bl[1].reshape(-1), np.float32)

    def set_bn(flax_params_mod: dict, flax_stats_mod: dict, bn_name: str, scale_name: str) -> None:
        if bn_name in blobs:
            bl = blobs[bn_name]
            sf = float(bl[2].reshape(-1)[0]) if len(bl) >= 3 else 1.0
            sf = sf if sf != 0.0 else 1.0
            flax_stats_mod["mean"] = np.asarray(bl[0].reshape(-1) / sf, np.float32)
            flax_stats_mod["var"] = np.asarray(bl[1].reshape(-1) / sf, np.float32)
        if scale_name in blobs:
            bl = blobs[scale_name]
            flax_params_mod["scale"] = np.asarray(bl[0].reshape(-1), np.float32)
            if len(bl) >= 2:
                flax_params_mod["bias"] = np.asarray(bl[1].reshape(-1), np.float32)

    set_conv(params.get("conv1", {}), "conv1")
    set_bn(params.get("bn1", {}), stats.get("bn1", {}), "bn_conv1", "scale_conv1")

    branch = {"conv1": "2a", "conv2": "2b", "conv3": "2c", "shortcut": "1"}
    bn_of = {"bn1": "2a", "bn2": "2b", "bn3": "2c", "shortcut_bn": "1"}
    for s, n_blocks in enumerate(stage_blocks, start=2):
        for b, blk in enumerate(_caffe_block_names(n_blocks)):
            mod = f"res{s}_{b}"
            if mod not in params:
                continue
            pmod = params[mod] = dict(params[mod])
            smod = stats.get(mod, {})
            for conv_name, br in branch.items():
                if conv_name in pmod:
                    pmod[conv_name] = dict(pmod[conv_name])
                    set_conv(pmod[conv_name], f"res{s}{blk}_branch{br}")
            for bn_name, br in bn_of.items():
                if bn_name in pmod:
                    pmod[bn_name] = dict(pmod[bn_name])
                    sm = dict(smod.get(bn_name, {}))
                    set_bn(pmod[bn_name], sm, f"bn{s}{blk}_branch{br}", f"scale{s}{blk}_branch{br}")
                    if sm:
                        smod = dict(smod)
                        smod[bn_name] = sm
            stats[mod] = smod

    for name in list(params):
        if name.startswith("fc1_voc12_c"):
            params[name] = dict(params[name])
            set_conv(params[name], name)

    return {"params": params, "batch_stats": stats}


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
