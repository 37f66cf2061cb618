"""ResNet-101 DeepLab: caffemodel import path + independent torch oracle.

Builds a synthetic DeepLab-v2-ResNet-named ``.caffemodel`` (conv
``res{S}{blk}_branch{1,2a,2b,2c}``, BatchNorm ``bn...`` with
[mean*sf, var*sf, sf] blobs, Scale ``scale...`` with [gamma, beta], heads
``fc1_voc12_c{k}``), imports it with ``resnet_blobs_to_flax``, and checks the
flax forward against an independent PyTorch implementation fed the SAME raw
caffe blobs (fp64).  Covers VERDICT r1 item 7: the name mapping and the
bottleneck/ASPP numerics in one end-to-end pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsrg_tpu.models import ResNet101DeepLab  # noqa: E402
from dsrg_tpu.models.import_caffe import (  # noqa: E402
    _caffe_block_names,
    load_caffemodel,
    resnet_blobs_to_flax,
)
from tests.test_import_caffe import _layer_v2  # wire-format encoder

STAGE_BLOCKS = (1, 1, 2, 1)  # res4 gets blocks a, b1 -> exercises b-numbering
HEAD_DILS = (2, 4)
NUM_CLASSES = 4
EPS = 1e-5


def _make_caffe_net(rng):
    """Random caffe blobs for the tiny ResNet, keyed by caffe layer name."""
    blobs = {}

    def conv(name, cout, cin, k):
        blobs[name] = [rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.2]

    def bn(name, c, sf=0.999):
        mean = rng.normal(size=c).astype(np.float32) * 0.1
        var = rng.uniform(0.5, 1.5, size=c).astype(np.float32)
        blobs[f"bn{name}"] = [mean * sf, var * sf, np.asarray([sf], np.float32)]
        blobs[f"scale{name}"] = [
            rng.uniform(0.5, 1.5, size=c).astype(np.float32),
            rng.normal(size=c).astype(np.float32) * 0.1,
        ]

    conv("conv1", 64, 3, 7)
    bn("_conv1", 64)

    widths = (64, 128, 256, 512)
    cin = 64
    for s, n_blocks in enumerate(STAGE_BLOCKS, start=2):
        w = widths[s - 2]
        for b, blk in enumerate(_caffe_block_names(n_blocks)):
            pre = f"res{s}{blk}"
            cur_in = cin if b == 0 else w * 4
            if cur_in != w * 4 or (b == 0 and s == 3):
                conv(f"{pre}_branch1", w * 4, cur_in, 1)
                bn(f"{s}{blk}_branch1", w * 4)
            conv(f"{pre}_branch2a", w, cur_in, 1)
            bn(f"{s}{blk}_branch2a", w)
            conv(f"{pre}_branch2b", w, w, 3)
            bn(f"{s}{blk}_branch2b", w)
            conv(f"{pre}_branch2c", w * 4, w, 1)
            bn(f"{s}{blk}_branch2c", w * 4)
        cin = w * 4
    for k in range(len(HEAD_DILS)):
        name = f"fc1_voc12_c{k}"
        blobs[name] = [
            rng.normal(size=(NUM_CLASSES, 2048, 3, 3)).astype(np.float32) * 0.05,
            rng.normal(size=NUM_CLASSES).astype(np.float32) * 0.1,
        ]
    return blobs


def _torch_forward(blobs, x_nchw):
    """Independent NCHW fp64 implementation of the same graph."""

    def t(a):
        return torch.tensor(np.asarray(a, np.float64))

    def conv(x, name, stride=1, dilation=1):
        w = t(blobs[name][0])
        b = t(blobs[name][1]) if len(blobs[name]) > 1 else None
        pad = dilation * (w.shape[-1] // 2)
        return F.conv2d(x, w, b, stride=stride, padding=pad, dilation=dilation)

    def bn(x, name):
        sf = float(blobs[f"bn{name}"][2][0]) or 1.0
        mean = t(blobs[f"bn{name}"][0]) / sf
        var = t(blobs[f"bn{name}"][1]) / sf
        gamma = t(blobs[f"scale{name}"][0])
        beta = t(blobs[f"scale{name}"][1])
        xn = (x - mean[None, :, None, None]) / torch.sqrt(var + EPS)[None, :, None, None]
        return xn * gamma[None, :, None, None] + beta[None, :, None, None]

    def caffe_max_pool(x, k, s, p):
        h, w = x.shape[-2:]
        oh = int(np.ceil((h + 2 * p - k) / s)) + 1
        ow = int(np.ceil((w + 2 * p - k) / s)) + 1
        ph = max((oh - 1) * s + k - p - h, 0)
        pw = max((ow - 1) * s + k - p - w, 0)
        x = F.pad(x, (p, pw, p, ph), value=float("-inf"))
        return F.max_pool2d(x, k, s)

    x = F.relu(bn(conv(x_nchw, "conv1", stride=2), "_conv1"))
    x = caffe_max_pool(x, 3, 2, 1)

    widths = (64, 128, 256, 512)
    strides = (1, 2, 1, 1)
    dilations = (1, 1, 2, 4)
    for s, n_blocks in enumerate(STAGE_BLOCKS, start=2):
        w, st, dil = widths[s - 2], strides[s - 2], dilations[s - 2]
        for b, blk in enumerate(_caffe_block_names(n_blocks)):
            pre = f"res{s}{blk}"
            stride = st if b == 0 else 1
            shortcut = x
            if f"{pre}_branch1" in blobs:
                shortcut = bn(conv(x, f"{pre}_branch1", stride=stride), f"{s}{blk}_branch1")
            y = F.relu(bn(conv(x, f"{pre}_branch2a", stride=stride), f"{s}{blk}_branch2a"))
            y = F.relu(bn(conv(y, f"{pre}_branch2b", dilation=dil), f"{s}{blk}_branch2b"))
            y = bn(conv(y, f"{pre}_branch2c"), f"{s}{blk}_branch2c")
            x = F.relu(y + shortcut)

    scores = None
    for k, dil in enumerate(HEAD_DILS):
        h = conv(x, f"fc1_voc12_c{k}", dilation=dil)
        scores = h if scores is None else scores + h
    return scores


def test_resnet_caffemodel_import_and_torch_crosscheck(tmp_path):
    rng = np.random.default_rng(0)
    blobs_np = _make_caffe_net(rng)

    # ship through the real wire format
    net = b"".join(_layer_v2(name, bl) for name, bl in blobs_np.items())
    path = str(tmp_path / "resnet.caffemodel")
    open(path, "wb").write(net)
    blobs = load_caffemodel(path)
    assert set(blobs) == set(blobs_np)

    model = ResNet101DeepLab(
        num_classes=NUM_CLASSES, head_dilations=HEAD_DILS, stage_blocks=STAGE_BLOCKS
    )
    x = rng.normal(size=(1, 33, 33, 3)).astype(np.float32) * 10
    template = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    variables = resnet_blobs_to_flax(blobs, template, stage_blocks=STAGE_BLOCKS)

    # completeness: every conv kernel and BN stat must have been overwritten
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_i = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(variables)}
    for key, tv in flat_t:
        ks = jax.tree_util.keystr(key)
        iv = flat_i[ks]
        assert not np.array_equal(np.asarray(iv), np.asarray(tv)), f"{ks} not imported"

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = (
            _torch_forward(blobs_np, torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
