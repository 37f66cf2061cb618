"""Probability-floored softmax.

Reference: the Caffe ``SoftmaxLayer`` python layer
(``pylayers/pylayers/pylayers.py:23-51``) computes a channel softmax, adds a
``min_prob=1e-4`` floor, and renormalizes so the channel sum is exactly one.
Gradients flow through the whole expression (the reference differentiates the
same composite with Theano's ``T.grad``), so plain JAX autodiff reproduces the
backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_PROB = 1e-4


def floored_softmax(logits: jnp.ndarray, axis: int = -1, min_prob: float = MIN_PROB) -> jnp.ndarray:
    """Channel softmax with an additive probability floor.

    ``probs = softmax(logits) + min_prob; probs /= probs.sum(axis)``

    Args:
      logits: unnormalized scores; softmax is taken over ``axis``.
      axis: class axis (the reference uses NCHW axis=1; we default to the
        trailing axis for NHWC-layout tensors).
      min_prob: additive floor (reference ``min_prob = 0.0001``,
        ``pylayers.py:20``).
    """
    z = logits - jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp(z)
    p = e / jnp.sum(e, axis=axis, keepdims=True) + min_prob
    return p / jnp.sum(p, axis=axis, keepdims=True)


def clamp_straight_through(x: jnp.ndarray, min_value: float) -> jnp.ndarray:
    """Value clamp with identity gradient — the CRFLayer blob mutation.

    The reference clamps the shared softmax blob *in place*
    (``pylayers.py:67``): downstream losses see the clamped values, but the
    gradient written back to the blob passes to the softmax backward
    untouched (Caffe applies no clamp Jacobian).  ``jnp.maximum`` would
    instead zero the gradient wherever the clamp is active — and the clamp IS
    active for every strongly-suppressed class (the floored softmax's minimum
    ``(0 + 1e-4) / (1 + 21e-4)`` sits *below* ``min_prob``), which would kill
    the seed loss's ability to recover suppressed seeded classes.
    """
    return x + jax.lax.stop_gradient(jnp.maximum(x, min_value) - x)
