"""Constrain-to-boundary loss (``ConstrainLossLayer``, pylayers.py:154-180).

A clipped KL(Q_crf || Q_net): ``mean over pixels of
sum_c Q_crf * log(clip(Q_crf / Q_net, 0.05, 20))``.  Gradients flow to *both*
inputs (the reference writes diffs for both bottoms, pylayers.py:176-180);
``jnp.clip`` matches Theano's clip gradient (pass-through inside the
interval, zero outside).
"""

from __future__ import annotations

import jax.numpy as jnp


def constrain_loss_per_sample(
    probs: jnp.ndarray, probs_smooth_log: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample clipped KL, shape ``(B,)`` — mean over each sample's pixels.

    Batch loss = mean of this vector (all samples share the pixel count);
    the per-sample form lets padded/masked DP steps weight samples exactly.
    """
    probs_smooth = jnp.exp(probs_smooth_log)
    ratio = jnp.clip(probs_smooth / probs, 0.05, 20.0)
    return jnp.mean(jnp.sum(probs_smooth * jnp.log(ratio), axis=-1), axis=(1, 2))


def constrain_loss(probs: jnp.ndarray, probs_smooth_log: jnp.ndarray) -> jnp.ndarray:
    """probs: (B, h, w, M) network marginals; probs_smooth_log: log CRF marginals."""
    return jnp.mean(constrain_loss_per_sample(probs, probs_smooth_log))
