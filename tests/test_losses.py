import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.losses import (
    balanced_seed_loss,
    constrain_loss,
    expand_loss,
    seed_loss,
    softmax_cross_entropy_ignore,
)
from dsrg_tpu.ops.softmax import MIN_PROB, floored_softmax


def _probs(rng, shape):
    logits = rng.normal(size=shape).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_floored_softmax_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 3, 5)).astype(np.float32) * 4
    got = np.asarray(floored_softmax(jnp.asarray(x)))
    e = np.exp(x - x.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True) + MIN_PROB
    ref = p / p.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-6)
    assert got.min() > 9e-5


def test_seed_loss_formula():
    rng = np.random.default_rng(1)
    probs = _probs(rng, (3, 4, 4, 6))
    labels = (rng.uniform(size=probs.shape) < 0.2).astype(np.float32)
    labels[:, 0, 0, 0] = 1.0  # ensure nonzero count
    got = float(seed_loss(jnp.asarray(probs), jnp.asarray(labels)))
    count = labels.sum((1, 2, 3), keepdims=True)
    ref = -np.mean(np.sum(labels * np.log(probs), (1, 2, 3), keepdims=True) / count)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_balanced_seed_loss_formula():
    rng = np.random.default_rng(2)
    probs = _probs(rng, (2, 5, 5, 4))
    labels = (rng.uniform(size=probs.shape) < 0.3).astype(np.float32)
    got = float(balanced_seed_loss(jnp.asarray(probs), jnp.asarray(labels)))
    pb, lb = probs[..., 0], labels[..., 0]
    pf, lf = probs[..., 1:], labels[..., 1:]
    cb = lb.sum((1, 2), keepdims=True)
    cf = lf.sum((1, 2, 3), keepdims=True)
    l1 = -np.mean(np.sum(lb * np.log(pb), (1, 2), keepdims=True) / np.maximum(cb, MIN_PROB))
    l2 = -np.mean(np.sum(lf * np.log(pf), (1, 2, 3), keepdims=True) / np.maximum(cf, MIN_PROB))
    np.testing.assert_allclose(got, l1 + l2, rtol=1e-5)


def test_balanced_seed_loss_zero_count_is_finite():
    rng = np.random.default_rng(3)
    probs = _probs(rng, (2, 5, 5, 4))
    labels = np.zeros_like(probs)
    got = float(balanced_seed_loss(jnp.asarray(probs), jnp.asarray(labels)))
    assert np.isfinite(got) and got == 0.0


def test_constrain_loss_formula_and_grads():
    rng = np.random.default_rng(4)
    probs = _probs(rng, (2, 4, 4, 5))
    smooth = _probs(rng, (2, 4, 4, 5))
    log_smooth = np.log(smooth)
    got = float(constrain_loss(jnp.asarray(probs), jnp.asarray(log_smooth)))
    ref = np.mean(np.sum(smooth * np.log(np.clip(smooth / probs, 0.05, 20.0)), -1))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # gradients exist for BOTH inputs (reference writes both bottom diffs)
    g1, g2 = jax.grad(lambda a, b: constrain_loss(a, b), argnums=(0, 1))(
        jnp.asarray(probs), jnp.asarray(log_smooth)
    )
    assert np.any(np.asarray(g1) != 0) and np.any(np.asarray(g2) != 0)


def test_expand_loss_formula():
    rng = np.random.default_rng(5)
    b, h, w, m = 2, 6, 7, 5
    probs = _probs(rng, (b, h, w, m))
    stat = np.zeros((b, m), np.float32)
    stat[:, 0] = 1.0
    stat[0, 2] = 1.0
    stat[1, 1] = stat[1, 3] = 1.0
    got = float(expand_loss(jnp.asarray(probs), jnp.asarray(stat)))

    q_fg, q_bg = 0.996, 0.999
    n = h * w
    pf = np.moveaxis(probs[..., 1:], -1, 1).reshape(b, m - 1, n)
    pb = probs[..., 0].reshape(b, n)
    wf = q_fg ** np.arange(n - 1, -1, -1)
    wb = q_bg ** np.arange(n - 1, -1, -1)
    pmean = (np.sort(pf, -1) * wf).sum(-1) / wf.sum()
    pbmean = (np.sort(pb, -1) * wb).sum(-1) / wb.sum()
    pmax = pf.max(-1)
    s = stat[:, 1:]
    l1 = -np.mean(np.sum(s * np.log(pmean) / s.sum(1, keepdims=True), 1))
    l2 = -np.mean(np.sum((1 - s) * np.log(1 - pmax) / (1 - s).sum(1, keepdims=True), 1))
    l3 = -np.mean(np.log(pbmean))
    np.testing.assert_allclose(got, l1 + l2 + l3, rtol=1e-5)


def test_softmax_ce_ignore():
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 4, 4))
    labels[0, 0, :] = 255
    loss, acc = softmax_cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels))
    valid = labels != 255
    logp = np.log(
        np.exp(logits - logits.max(-1, keepdims=True))
        / np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
    )
    ref = -np.sum(logp[valid, labels[valid]]) / valid.sum()
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
    ref_acc = (logits.argmax(-1)[valid] == labels[valid]).mean()
    np.testing.assert_allclose(float(acc), ref_acc, rtol=1e-5)


def test_clamp_straight_through_gradient_semantics():
    """The CRFLayer blob mutation: clamped VALUES, identity GRADIENT — a
    plain jnp.maximum would zero the seed-loss gradient for every strongly
    suppressed seeded class (reference passes it through)."""
    from dsrg_tpu.ops.softmax import clamp_straight_through

    x = jnp.asarray([5e-5, 2e-4, 0.9])
    y = clamp_straight_through(x, MIN_PROB)
    np.testing.assert_allclose(np.asarray(y), [1e-4, 2e-4, 0.9], rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(clamp_straight_through(v, MIN_PROB) * jnp.asarray([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])  # identity bwd
    # contrast: jnp.maximum gates the first entry
    g2 = jax.grad(lambda v: jnp.sum(jnp.maximum(v, MIN_PROB) * jnp.asarray([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(np.asarray(g2), [0.0, 2.0, 3.0])


def test_seed_and_expand_losses_finite_on_degenerate_batches():
    """The reference's bare divisions NaN on cue-less samples / all-or-no-fg
    images (pylayers.py:104-105, 216-217); our floored divisors keep the
    loss finite with a 0 contribution for the degenerate term instead."""
    import jax.numpy as jnp
    import numpy as np

    from dsrg_tpu.losses.expand import expand_loss
    from dsrg_tpu.losses.seed import seed_loss

    probs = jnp.full((2, 4, 4, 21), 1.0 / 21)
    # sample 0 has cues, sample 1 has none
    labels = np.zeros((2, 4, 4, 21), np.float32)
    labels[0, 1, 1, 3] = 1.0
    assert np.isfinite(float(seed_loss(probs, jnp.asarray(labels))))

    stat_all = jnp.ones((1, 21))   # every fg class present -> loss_2 term 0/0
    stat_none = jnp.concatenate([jnp.ones((1, 1)), jnp.zeros((1, 20))], axis=1)
    for stat in (stat_all, stat_none):
        v = float(expand_loss(probs[:1], stat))
        assert np.isfinite(v), v
