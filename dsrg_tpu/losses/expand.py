"""SEC expand loss via global weighted rank pooling.

Reference: ``ExpandLossLayer`` (pylayers.py:183-233), which hardcodes 41x41
score maps, 20 foreground classes and decays q_fg=0.996 / q_bg=0.999.  We
generalize to the input's actual spatial size and class count (the hardcoded
values fall out naturally) while keeping the same formula:

  * per foreground class, sort pixel probabilities ascending and take the
    weighted mean with weights q^(n-1-rank) (largest probability gets q^0);
  * classes present in the image pull their rank-pooled mean up (loss_1),
    absent classes push their max down (loss_2), and the background's
    rank-pooled mean is pulled up unconditionally (loss_3).

Deliberate deviation: both per-sample class-count divisors are floored
(the reference's bare divisions, pylayers.py:216-217, NaN whenever an
image contains no foreground class — loss_1 — or ALL foreground classes
— loss_2; with the floor those samples contribute 0 to the respective
term instead).
"""

from __future__ import annotations

import jax.numpy as jnp

from dsrg_tpu.ops.softmax import MIN_PROB


def _rank_pool(x_flat: jnp.ndarray, q: float) -> jnp.ndarray:
    """Weighted rank pooling over the last axis of (..., n) probabilities."""
    n = x_flat.shape[-1]
    x_sorted = jnp.sort(x_flat, axis=-1)  # ascending
    weights = q ** jnp.arange(n - 1, -1, -1, dtype=x_flat.dtype)
    z = jnp.sum(weights)
    return jnp.sum(x_sorted * weights, axis=-1) / z


def expand_loss(
    probs: jnp.ndarray,
    stat: jnp.ndarray,
    q_fg: float = 0.996,
    q_bg: float = 0.999,
) -> jnp.ndarray:
    """probs: (B, h, w, M); stat: (B, M) multi-hot image labels (bit 0 = bg)."""
    b, h, w, m = probs.shape
    probs_bg = probs[..., 0].reshape(b, h * w)
    probs_fg = jnp.moveaxis(probs[..., 1:], -1, 1).reshape(b, m - 1, h * w)

    stat_fg = (stat[:, 1:] > 0.5).astype(probs.dtype)  # (B, M-1)

    probs_max = jnp.max(probs_fg, axis=-1)  # (B, M-1)
    probs_mean = _rank_pool(probs_fg, q_fg)  # (B, M-1)
    probs_bg_mean = _rank_pool(probs_bg, q_bg)  # (B,)

    loss_1 = -jnp.mean(
        jnp.sum(
            stat_fg
            * jnp.log(probs_mean)
            / jnp.maximum(jnp.sum(stat_fg, axis=1, keepdims=True), MIN_PROB),
            axis=1,
        )
    )
    loss_2 = -jnp.mean(
        jnp.sum(
            (1.0 - stat_fg)
            * jnp.log(1.0 - probs_max)
            / jnp.maximum(jnp.sum(1.0 - stat_fg, axis=1, keepdims=True), MIN_PROB),
            axis=1,
        )
    )
    loss_3 = -jnp.mean(jnp.log(probs_bg_mean))
    return loss_1 + loss_2 + loss_3
