"""Seeding losses (SEC / DSRG).

Plain JAX functions under autodiff — the reference builds the identical
expressions in Theano and differentiates with ``T.grad``
(``pylayers/pylayers/pylayers.py:95-152``), so ``jax.grad`` reproduces the
backward passes exactly.

Layout note: the reference is NCHW; we take NHWC (B, h, w, M) with the class
axis last (TPU-native).  All reductions are axis-renamed accordingly.
"""

from __future__ import annotations

import jax.numpy as jnp

from dsrg_tpu.ops.softmax import MIN_PROB


def seed_loss(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """SEC-style seeding loss (``SeedLossLayer``, pylayers.py:95-118).

    ``-mean_b( sum(labels * log(probs)) / count_b )`` with ``count_b`` the
    per-sample number of seed entries.  Unused by the shipped prototxts but
    part of the reference's layer surface.

    Deliberate deviation: ``count_b`` is floored at ``MIN_PROB`` like its
    sibling :func:`balanced_seed_loss` — the reference's bare division
    (pylayers.py:104-105) returns NaN for a cue-less sample and poisons the
    whole batch; the floor only changes that degenerate case (a zero
    numerator then yields a 0 contribution instead of NaN).
    """
    count = jnp.sum(labels, axis=(1, 2, 3), keepdims=True)
    per = jnp.sum(labels * jnp.log(probs), axis=(1, 2, 3), keepdims=True) / jnp.maximum(
        count, MIN_PROB
    )
    return -jnp.mean(per)


def balanced_seed_loss_per_sample(
    probs: jnp.ndarray, labels: jnp.ndarray, min_prob: float = MIN_PROB
) -> jnp.ndarray:
    """Per-sample stage-1 seed loss, shape ``(B,)``.

    The batch loss is the mean of this vector; exposing the per-sample terms
    lets padded/masked data-parallel steps weight each sample (pad rows get
    weight 0) and reduce with an exact sum/psum-count instead of a mean —
    required for sharding the reference's batch-20/10 recipes over meshes
    that do not divide the batch.
    """
    probs_bg = probs[..., 0]
    labels_bg = labels[..., 0]
    probs_fg = probs[..., 1:]
    labels_fg = labels[..., 1:]

    count_bg = jnp.sum(labels_bg, axis=(1, 2))
    count_fg = jnp.sum(labels_fg, axis=(1, 2, 3))
    loss_bg = -(
        jnp.sum(labels_bg * jnp.log(probs_bg), axis=(1, 2))
        / jnp.maximum(count_bg, min_prob)
    )
    loss_fg = -(
        jnp.sum(labels_fg * jnp.log(probs_fg), axis=(1, 2, 3))
        / jnp.maximum(count_fg, min_prob)
    )
    return loss_bg + loss_fg


def balanced_seed_loss(
    probs: jnp.ndarray, labels: jnp.ndarray, min_prob: float = MIN_PROB
) -> jnp.ndarray:
    """The stage-1 seed loss (``BalancedSeedLossLayer``, pylayers.py:120-152).

    Background (class 0) and foreground (classes 1:) cross-entropy terms are
    normalized separately by their per-sample seed counts, each floored at
    ``min_prob`` to avoid division by zero, then summed.
    """
    return jnp.mean(balanced_seed_loss_per_sample(probs, labels, min_prob))
