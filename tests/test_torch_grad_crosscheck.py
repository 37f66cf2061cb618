"""End-to-end gradient cross-check: one full train-step update (VGG backbone,
floored softmax, balanced seed loss, Caffe-SGD with lr/decay multipliers)
computed independently in PyTorch fp64 must match our JAX step."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dsrg_tpu.models import DeepLabLargeFOV  # noqa: E402
from dsrg_tpu.ops.softmax import MIN_PROB, floored_softmax  # noqa: E402
from dsrg_tpu.losses import balanced_seed_loss  # noqa: E402
from dsrg_tpu.train.optimizer import caffe_sgd  # noqa: E402

# e2e/subprocess/distributed tier (VERDICT r2 item 6): excluded from the
# fast core gate via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

BASE_LR, MOM, WD = 1e-3, 0.9, 5e-4
HEADS = (2,)


def _torch_loss(params_t, x, cues):
    from tests.test_torch_crosscheck import _torch_forward

    scores = _torch_forward(params_t, x, HEADS)  # NCHW fp64
    scores = scores.permute(0, 2, 3, 1)  # NHWC
    z = scores - scores.max(-1, keepdim=True).values
    e = torch.exp(z)
    p = e / e.sum(-1, keepdim=True) + MIN_PROB
    p = p / p.sum(-1, keepdim=True)
    p = torch.clamp(p, min=MIN_PROB)

    pb, lb = p[..., 0], cues[..., 0]
    pf, lf = p[..., 1:], cues[..., 1:]
    cb = lb.sum((1, 2), keepdim=True)
    cf = lf.sum((1, 2, 3), keepdim=True)
    l1 = -torch.mean(torch.sum(lb * torch.log(pb), (1, 2), keepdim=True)
                     / torch.clamp(cb, min=MIN_PROB))
    l2 = -torch.mean(torch.sum(lf * torch.log(pf), (1, 2, 3), keepdim=True)
                     / torch.clamp(cf, min=MIN_PROB))
    return l1 + l2


def test_full_sgd_step_matches_torch():
    m = 4
    model = DeepLabLargeFOV(num_classes=m, head_dilations=HEADS, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 41, 41, 3)).astype(np.float32) * 10
    labels = np.zeros((2, m), np.float32)
    labels[:, 0] = labels[:, 2] = 1.0
    cues = (rng.uniform(size=(2, 6, 6, m)) < 0.2).astype(np.float32) * labels[:, None, None, :]

    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)["params"]

    # --- JAX: loss + grads + caffe-SGD update ---
    def loss_fn(p):
        scores = model.apply({"params": p}, jnp.asarray(x), train=False)
        probs = jnp.maximum(floored_softmax(scores), MIN_PROB)
        return balanced_seed_loss(probs, jnp.asarray(cues))

    jax_loss, grads = jax.value_and_grad(loss_fn)(params)
    tx = caffe_sgd(lambda s: BASE_LR, momentum=MOM, weight_decay=WD)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    # --- torch fp64: same loss, autograd, manual caffe-SGD ---
    params_t = {}
    for name, leaves in params.items():
        params_t[name] = {
            k: torch.tensor(np.asarray(v), dtype=torch.float64, requires_grad=True)
            for k, v in leaves.items()
        }
    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    cues_t = torch.tensor(cues, dtype=torch.float64)
    loss_t = _torch_loss(params_t, xt, cues_t)
    loss_t.backward()

    np.testing.assert_allclose(float(jax_loss), float(loss_t), rtol=1e-4)

    for name, leaves in params_t.items():
        is_head = name.startswith("fc8")
        for k, w in leaves.items():
            is_bias = k == "bias"
            lr_mult = (20.0 if is_bias else 10.0) if is_head else (2.0 if is_bias else 1.0)
            dec_mult = 0.0 if is_bias else 1.0
            g = w.grad.detach().numpy() + WD * dec_mult * w.detach().numpy()
            expect = w.detach().numpy() - BASE_LR * lr_mult * g
            got = np.asarray(new_params[name][k])
            np.testing.assert_allclose(
                got, expect, rtol=2e-3, atol=2e-6,
                err_msg=f"{name}/{k}",
            )
