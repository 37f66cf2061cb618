"""Caffe-exact SGD with per-parameter learning-rate/decay multipliers.

Reproduces Caffe's ``SGDSolver`` update order (regularize -> scale by local
rate -> momentum -> apply):

    g <- g + weight_decay * decay_mult * w
    g <- base_lr(step) * lr_mult * g
    v <- momentum * v + g
    w <- w - v

with per-layer multipliers from the prototxt ``param {}`` blocks
(``train-s.prototxt``): conv weights lr_mult 1 / decay_mult 1, biases 2 / 0,
and the freshly-initialized fc8 heads 10 / 1 (weights) and 20 / 0 (biases).

LR policies (``solver-s.prototxt:5-8``, ``solver-f.prototxt:5-7``):
  step:  base * gamma^floor(step / stepsize)
  poly:  base * (1 - step / max_iter)^power
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_step(base_lr: float, gamma: float, stepsize: int) -> Callable:
    def fn(step):
        return base_lr * gamma ** jnp.floor(step / stepsize)
    return fn


def lr_poly(base_lr: float, power: float, max_iter: int) -> Callable:
    def fn(step):
        return base_lr * (1.0 - step / max_iter) ** power
    return fn


def vgg_param_mults(params) -> tuple:
    """(lr_mult, decay_mult) trees from flax param names.

    fc8 heads ("fc8-SEC_*" / any name starting with "fc8") get the 10x/20x
    boost of the reference prototxt; biases never decay.
    """

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    lr_leaves, dec_leaves = [], []
    for path, _ in flat:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        is_bias = names[-1] == "bias"
        is_head = any(str(n).startswith("fc8") or str(n).startswith("fc1_voc12") for n in names)
        is_bn = any("bn" in str(n) for n in names)
        if is_bn:
            # Caffe-DeepLab freezes batch-norm scale/shift (lr_mult 0)
            lr_leaves.append(0.0)
            dec_leaves.append(0.0)
            continue
        if is_head:
            lr_leaves.append(20.0 if is_bias else 10.0)
        else:
            lr_leaves.append(2.0 if is_bias else 1.0)
        dec_leaves.append(0.0 if is_bias else 1.0)
    return (
        jax.tree_util.tree_unflatten(treedef, lr_leaves),
        jax.tree_util.tree_unflatten(treedef, dec_leaves),
    )


class CaffeSGDState(NamedTuple):
    step: jnp.ndarray
    velocity: optax.Params


def caffe_sgd(
    lr_fn: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    mults_fn: Callable = vgg_param_mults,
    clip_gradients: float = 0.0,
) -> optax.GradientTransformation:
    """optax-style transformation implementing the Caffe SGD update.

    ``clip_gradients`` > 0 reproduces the Caffe solver's ``clip_gradients``
    field (``SGDSolver::ClipGradients``): when the global L2 norm of the raw
    gradients exceeds the threshold, every gradient is scaled by
    ``threshold / norm`` BEFORE regularization/lr/momentum — the update order
    Caffe uses (ClipGradients -> Regularize -> ComputeUpdateValue).  The
    VGG recipe never sets it; deeper warm-started backbones (ResNet-101,
    whose 10x-lr heads see large early gradients) need it to stay stable.
    """

    def init(params):
        return CaffeSGDState(
            step=jnp.zeros([], jnp.int32),
            velocity=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        if clip_gradients and clip_gradients > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_gradients / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        lr_mults, dec_mults = mults_fn(params)
        lr = lr_fn(state.step)

        def one(g, v, w, lm, dm):
            g = g + weight_decay * dm * w
            g = (lr * lm) * g
            v_new = momentum * v + g
            return v_new

        velocity = jax.tree.map(one, grads, state.velocity, params, lr_mults, dec_mults)
        updates = jax.tree.map(lambda v: -v, velocity)
        return updates, CaffeSGDState(step=state.step + 1, velocity=velocity)

    return optax.GradientTransformation(init, update)
