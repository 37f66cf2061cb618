"""Independent cross-check of the VGG16-LargeFOV backbone against a
PyTorch implementation of the same prototxt graph (same weights, same
geometry: caffe pooling windows, dilated convs, summed heads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsrg_tpu.models import DeepLabLargeFOV  # noqa: E402


def _torch_forward(params, x_nchw, head_dilations):
    """Reference prototxt graph in torch, NCHW, fp64 for a tight oracle."""

    def conv(x, name, dilation=1):
        w = params[name]["kernel"]
        b = params[name]["bias"]
        if not torch.is_tensor(w):  # jax leaves -> fresh fp64 tensors
            w = torch.tensor(np.asarray(w), dtype=torch.float64)
            b = torch.tensor(np.asarray(b), dtype=torch.float64)
        w = w.permute(3, 2, 0, 1)  # HWIO -> OIHW
        pad = dilation * (w.shape[-1] // 2)
        return F.conv2d(x, w, b, padding=pad, dilation=dilation)

    def caffe_max_pool(x, k, s, p):
        h, w = x.shape[-2:]
        oh = int(np.ceil((h + 2 * p - k) / s)) + 1
        ow = int(np.ceil((w + 2 * p - k) / s)) + 1
        ph = max((oh - 1) * s + k - p - h, 0)
        pw = max((ow - 1) * s + k - p - w, 0)
        x = F.pad(x, (p, pw, p, ph), value=float("-inf"))
        return F.max_pool2d(x, k, s)

    def caffe_avg_pool(x, k, s, p):
        h, w = x.shape[-2:]
        oh = int(np.ceil((h + 2 * p - k) / s)) + 1
        ow = int(np.ceil((w + 2 * p - k) / s)) + 1
        ph = max((oh - 1) * s + k - p - h, 0)
        pw = max((ow - 1) * s + k - p - w, 0)
        x = F.pad(x, (p, pw, p, ph), value=0.0)
        summed = F.avg_pool2d(x, k, s, divisor_override=1)
        return summed / float(k * k)

    x = x_nchw
    stages = [("conv1", 2, 1, 2), ("conv2", 2, 1, 2), ("conv3", 3, 1, 2),
              ("conv4", 3, 1, 1), ("conv5", 3, 2, 1)]
    for name, n, dil, pstride in stages:
        for i in range(1, n + 1):
            x = F.relu(conv(x, f"{name}_{i}", dilation=dil))
        x = caffe_max_pool(x, 3, pstride, 1)
    x = caffe_avg_pool(x, 3, 1, 1)

    scores = None
    for k, d in enumerate(head_dilations, start=1):
        h = F.relu(conv(x, f"fc6_{k}", dilation=d))
        h = F.relu(conv(h, f"fc7_{k}"))
        h = conv(h, f"fc8-SEC_{k}")
        scores = h if scores is None else scores + h
    return scores


def test_vgg_largefov_matches_torch_reference():
    head_dilations = (2, 4)
    model = DeepLabLargeFOV(num_classes=6, head_dilations=head_dilations)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 65, 65, 3)).astype(np.float32) * 30

    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False
    )["params"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=False))

    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    with torch.no_grad():
        ref = _torch_forward(params, xt, head_dilations).numpy().transpose(0, 2, 3, 1)

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
