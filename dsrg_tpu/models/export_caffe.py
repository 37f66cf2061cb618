"""Export flax variables back to the Caffe ``.caffemodel`` wire format.

The inverse of ``import_caffe``: writes a V2 NetParameter (layer field 100,
BlobProto data field 5 + shape field 7) that ``load_caffemodel`` — and any
stock Caffe build — parses back bit-exactly.  Uses the same DeepLab layer
naming contracts as the importer:

  VGG16-LargeFOV: prototxt layer names verbatim (conv1_1..fc8-SEC_k)
    (reference ``train-s.prototxt:41-744``).
  ResNet-101 DeepLab-v2: convs ``conv1`` / ``res{S}{blk}_branch{1,2a,2b,2c}``,
    BatchNorm ``bn...`` with blobs [mean*sf, var*sf, [sf]], Scale ``scale...``
    with [gamma, beta], heads ``fc1_voc12_c{k}``.

Why this exists: (1) round-trip users back to Caffe deployments; (2) the
ResNet warm-start contract — the reference NEVER trains ResNet from scratch
(frozen-BN contract), so proving the second model family learns requires a
realistic warm-start artifact.  ``tools/calibrate_bn.py`` builds one by
running a BN-statistics calibration pass and exporting through this module,
then the trainer imports it through the REAL ``--weights *.caffemodel`` path.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


# --- protobuf wire encoding (protobuf is not a dependency; the format is
# --- stable: varint keys, length-delimited submessages, packed f32 data)

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


def _blob(arr: np.ndarray) -> bytes:
    data = _len_field(5, np.ascontiguousarray(arr, "<f4").tobytes())
    shape_payload = _len_field(1, b"".join(_varint(int(d)) for d in arr.shape))
    return data + _len_field(7, shape_payload)


def _layer(name: str, blobs: List[np.ndarray], ltype: str = "Convolution") -> bytes:
    payload = _len_field(1, name.encode()) + _len_field(2, ltype.encode())
    for b in blobs:
        payload += _len_field(7, _blob(np.asarray(b)))
    return _len_field(100, payload)


def write_caffemodel(path: str, layers: Dict[str, List[np.ndarray]],
                     net_name: str = "dsrg-tpu-export") -> None:
    """Write ``{layer_name: [blobs]}`` as a V2 .caffemodel."""
    buf = _len_field(1, net_name.encode())
    for name, blobs in layers.items():
        buf += _layer(name, blobs)
    with open(path, "wb") as f:
        f.write(buf)


# --- flax -> caffe blob trees ------------------------------------------------

def _kernel_to_caffe(kernel: np.ndarray) -> np.ndarray:
    """flax HWIO -> caffe OIHW."""
    return np.asarray(kernel, np.float32).transpose(3, 2, 0, 1)


def vgg_params_to_blobs(params) -> Dict[str, List[np.ndarray]]:
    """DeepLabLargeFOV params -> caffe blobs (layer names are prototxt-exact)."""
    out: Dict[str, List[np.ndarray]] = {}
    for name, mod in params.items():
        if "kernel" not in mod:
            continue
        blobs = [_kernel_to_caffe(np.asarray(mod["kernel"]))]
        if "bias" in mod:
            blobs.append(np.asarray(mod["bias"], np.float32))
        out[name] = blobs
    return out


def resnet_variables_to_blobs(
    variables, stage_blocks=(3, 4, 23, 3)
) -> Dict[str, List[np.ndarray]]:
    """ResNet101DeepLab {params, batch_stats} -> DeepLab-v2 caffe blob dict.

    Exact inverse of ``import_caffe.resnet_blobs_to_flax`` (scale factor
    sf = 1): BN stats become [mean, var, [1.0]], BatchNorm's learned
    scale/bias become the Scale layer's [gamma, beta].
    """
    from dsrg_tpu.models.import_caffe import _caffe_block_names

    params = variables["params"]
    stats = variables["batch_stats"]
    out: Dict[str, List[np.ndarray]] = {}

    def put_bn(caffe_suffix: str, pmod, smod) -> None:
        out[f"bn{caffe_suffix}"] = [
            np.asarray(smod["mean"], np.float32),
            np.asarray(smod["var"], np.float32),
            np.asarray([1.0], np.float32),
        ]
        out[f"scale{caffe_suffix}"] = [
            np.asarray(pmod["scale"], np.float32),
            np.asarray(pmod["bias"], np.float32),
        ]

    out["conv1"] = [_kernel_to_caffe(params["conv1"]["kernel"])]
    put_bn("_conv1", params["bn1"], stats["bn1"])

    branch = {"conv1": "2a", "conv2": "2b", "conv3": "2c", "shortcut": "1"}
    bn_of = {"bn1": "2a", "bn2": "2b", "bn3": "2c", "shortcut_bn": "1"}
    for s, n_blocks in enumerate(stage_blocks, start=2):
        for b, blk in enumerate(_caffe_block_names(n_blocks)):
            mod = f"res{s}_{b}"
            pmod, smod = params[mod], stats[mod]
            for conv_name, br in branch.items():
                if conv_name in pmod:
                    out[f"res{s}{blk}_branch{br}"] = [
                        _kernel_to_caffe(pmod[conv_name]["kernel"])
                    ]
            for bn_name, br in bn_of.items():
                if bn_name in pmod:
                    put_bn(f"{s}{blk}_branch{br}", pmod[bn_name], smod[bn_name])

    for name, mod in params.items():
        if name.startswith("fc1_voc12_c"):
            out[name] = [
                _kernel_to_caffe(mod["kernel"]),
                np.asarray(mod["bias"], np.float32),
            ]
    return out
