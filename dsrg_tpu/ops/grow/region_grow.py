"""Deep seeded region growing as an on-device frontier propagation.

This replaces the reference's per-image host pipeline
(``pylayers/pylayers/pylayers.py:237-275`` fanned out over a
``multiprocessing.Pool`` at ``:341-342``): two-pass union-find
connected-component labeling (``CC_labeling_8.py:112-198``) followed by
"expand every component that contains an original seed pixel".

Key observation: *the set of pixels in seed-containing components* is exactly
the set of pixels reachable from seed pixels through the candidate mask under
8-connectivity.  So instead of translating the pointer-chasing union-find, we
flood-fill: iterate ``frontier = (dilate8(frontier) | frontier) & mask`` to a
fixed point.  Each iteration is a 3x3 max-pool — pure VPU work — and the whole
batch runs inside one jit program under ``vmap``.

Reference semantics reproduced bit-for-bit (verified against an independent
oracle in ``tests/oracles/grow_oracle.py``):

* candidate label map: cue pixels get ``class + 1`` with the *highest* class
  winning collisions (``pylayers.py:248-250``: ascending ``np.where`` order,
  last write wins); then per-pixel argmax over the classes present in the
  image overwrites with ``argc + 1`` when the refined max-prob exceeds
  ``th2`` (foreground) or ``th1`` (background) (``pylayers.py:251-257``);
  the argmax takes the *first* maximal class in ascending order, matching
  ``np.argmax`` over the class-sorted subset.
* classes are processed sequentially in ascending order and mutate the seed
  tensor as they go (``pylayers.py:259-273``) — a seed grown for class c
  changes the barrier condition for classes c' > c.
* barrier pixels — candidates already seeded by exactly one *other* class
  (``pylayers.py:268-269``) — still conduct connectivity (the reference
  re-labels them to -1 only *after* components are computed) but are never
  themselves converted into seeds of the growing class.

The reference's backward is a pass-through of the top diff to the probs bottom
(``pylayers.py:307-308``), but the grown cues feed ``BalancedSeedLossLayer``
as labels, which never writes a diff for them — so no gradient flows through
region growing at all.  We therefore wrap everything in ``stop_gradient``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dilate8(mask_f: jnp.ndarray) -> jnp.ndarray:
    """8-connected dilation of an (h, w) {0,1} float mask via 3x3 max-pool."""
    return jax.lax.reduce_window(
        mask_f,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )


def _flood_fill(seeded: jnp.ndarray, mask: jnp.ndarray, unroll: int = 4) -> jnp.ndarray:
    """Pixels 8-connected-reachable from ``seeded`` within ``mask`` ({0,1} floats).

    ``unroll`` dilation steps run between convergence checks: growth is
    monotone and idempotent at the fixed point, so extra steps past
    convergence change nothing while cutting the number of tiny
    latency-bound loop iterations (and, under vmap, cross-lane OR reductions)
    by the unroll factor.
    """
    max_iters = seeded.shape[-2] * seeded.shape[-1]

    def cond(state):
        it, frontier, changed = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        it, frontier, _ = state
        grown = frontier
        for _ in range(unroll):
            grown = jnp.maximum(jnp.minimum(_dilate8(grown), mask), grown)
        changed = jnp.any(grown != frontier)
        return it + unroll, grown, changed

    _, reach, _ = jax.lax.while_loop(cond, body, (0, seeded, jnp.any(seeded > 0)))
    return reach


def grow_seeds_single(
    image_labels: jnp.ndarray,
    cues: jnp.ndarray,
    probs_refined: jnp.ndarray,
    th1: float = 0.99,
    th2: float = 0.85,
) -> jnp.ndarray:
    """Grow seeds for one image.

    Args:
      image_labels: (M,) multi-hot image-level labels (bit 0 = background,
        always set by the data layer, ``pylayers.py:378``).
      cues: (h, w, M) {0,1} seed cues.
      probs_refined: (h, w, M) CRF-refined class marginals.
      th1: background confidence threshold (reference param_str th1=0.99).
      th2: foreground confidence threshold (reference param_str th2=0.85).

    Returns:
      (h, w, M) grown seed cues (superset of ``cues`` on present classes).
    """
    h, w, m = cues.shape
    f32 = jnp.float32
    present = image_labels > 0.5  # (M,)

    neg_inf = jnp.asarray(-jnp.inf, probs_refined.dtype)
    masked = jnp.where(present[None, None, :], probs_refined, neg_inf)
    argc = jnp.argmax(masked, axis=-1)  # first max, ascending class order
    maxp = jnp.max(masked, axis=-1)

    class_ids = jnp.arange(m, dtype=jnp.int32)
    cue_label = jnp.max(
        jnp.where(cues > 0.5, class_ids[None, None, :] + 1, 0), axis=-1
    )  # highest cue class wins, matching pylayers.py:248-250

    fg_hit = jnp.logical_and(maxp > th2, argc != 0)
    # Reference (pylayers.py:251-257): background needs value > th2 AND
    # value > th1 (nested ifs) — both conjuncts kept so callers passing
    # th1 < th2 match the reference and native/region_grow.cpp exactly.
    bg_hit = jnp.logical_and(argc == 0, jnp.logical_and(maxp > th1, maxp > th2))
    label_map = jnp.where(fg_hit, argc + 1, cue_label)
    label_map = jnp.where(bg_hit, 1, label_map)

    seed0 = (cues > 0.5).astype(f32)  # (h, w, M)

    def per_class(seed, c):
        mat = (label_map == c + 1).astype(f32)
        is_seed_c = seed[:, :, c]
        seeded = mat * is_seed_c
        total = jnp.sum(seed, axis=-1)
        barrier = mat * (1.0 - is_seed_c) * (total == 1.0).astype(f32)
        reach = _flood_fill(seeded, mat)
        new_c = jnp.maximum(is_seed_c, reach * (1.0 - barrier))
        new_c = jnp.where(present[c], new_c, is_seed_c)
        return seed.at[:, :, c].set(new_c), None

    seed_final, _ = jax.lax.scan(per_class, seed0, jnp.arange(m, dtype=jnp.int32))
    return seed_final


def dsrg_grow(
    image_labels: jnp.ndarray,
    cues: jnp.ndarray,
    probs_refined: jnp.ndarray,
    th1: float = 0.99,
    th2: float = 0.85,
) -> jnp.ndarray:
    """Batched DSRG seed expansion: (B, M), (B, h, w, M), (B, h, w, M) -> (B, h, w, M).

    Non-differentiable by construction (see module docstring); the output is
    detached from the autodiff graph.
    """
    image_labels = jax.lax.stop_gradient(image_labels)
    cues = jax.lax.stop_gradient(cues)
    probs_refined = jax.lax.stop_gradient(probs_refined)
    grow = partial(grow_seeds_single, th1=th1, th2=th2)
    return jax.vmap(grow)(image_labels, cues, probs_refined)
