"""DenseCRF debug hooks, compatibilities, objectives, pydensecrf-compat."""

import numpy as np
import jax.numpy as jnp

from dsrg_tpu.ops.crf.api import (
    DenseCRF,
    DiagonalCompatibility,
    MatrixCompatibility,
    PottsCompatibility,
)
from dsrg_tpu.ops.crf.objectives import (
    hamming,
    intersection_over_union,
    log_likelihood,
    minimize_lbfgs,
)
from dsrg_tpu.utils.pydensecrf_compat import dense_crf


def _crf(rng, h=5, w=6, m=4):
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    probs = rng.dirichlet(np.ones(m), size=h * w).astype(np.float32)
    crf = DenseCRF(w, h, m)
    crf.set_unary_energy(-probs.ravel())
    crf.add_pairwise_energy(10, 8, 8, 13, 13, 13, 3, 3, 3, image.ravel().astype(np.uint8))
    return crf, probs.reshape(h, w, m), image


def test_step_inference_matches_full_inference():
    rng = np.random.default_rng(0)
    crf, probs, _ = _crf(rng)
    q = crf.start_inference()
    for _ in range(5):
        q = crf.step_inference(q)
    full = crf.inference(5).reshape(q.shape)
    np.testing.assert_allclose(q, full, rtol=1e-4, atol=1e-6)


def test_kl_divergence_decreases_under_mean_field():
    rng = np.random.default_rng(1)
    crf, _, _ = _crf(rng)
    q = crf.start_inference()
    kls = [crf.kl_divergence(q)]
    for _ in range(4):
        q = crf.step_inference(q)
        kls.append(crf.kl_divergence(q))
    assert kls[-1] < kls[0]  # mean field minimizes the KL free energy


def test_unary_and_pairwise_energy_shapes():
    rng = np.random.default_rng(2)
    crf, probs, _ = _crf(rng)
    labels = probs.reshape(-1, probs.shape[-1]).argmax(-1)
    ue = crf.unary_energy(labels)
    pe = crf.pairwise_energy(labels)
    assert ue.shape == (crf.N,) and pe.shape == (crf.N,)
    # per-term decomposition sums to the total
    np.testing.assert_allclose(
        pe, crf.pairwise_energy(labels, 0) + crf.pairwise_energy(labels, 1), rtol=1e-5
    )
    # unary energy of labeling l is the stored cost at l
    assert np.all(np.isfinite(ue))


def test_diagonal_and_matrix_compatibilities():
    rng = np.random.default_rng(3)
    h, w, m = 4, 4, 3
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    probs = rng.dirichlet(np.ones(m), size=h * w).astype(np.float32)

    crf = DenseCRF(w, h, m)
    crf.set_unary_energy(-probs.ravel())
    crf.add_pairwise_gaussian(3, 3, DiagonalCompatibility(-np.ones(m) * 2.0))
    q1 = crf.inference(3).reshape(h, w, m)

    crf2 = DenseCRF(w, h, m)
    crf2.set_unary_energy(-probs.ravel())
    crf2.add_pairwise_gaussian(3, 3, MatrixCompatibility(-2.0 * np.eye(m)))
    q2 = crf2.inference(3).reshape(h, w, m)

    crf3 = DenseCRF(w, h, m)
    crf3.set_unary_energy(-probs.ravel())
    crf3.add_pairwise_gaussian(3, 3, PottsCompatibility(2.0))
    q3 = crf3.inference(3).reshape(h, w, m)

    # diag(-2) == matrix(-2I) == Potts(2): all three conventions coincide
    np.testing.assert_allclose(q1, q2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(q1, q3, rtol=1e-5, atol=1e-7)


def test_objectives():
    rng = np.random.default_rng(4)
    n, m = 50, 4
    q = rng.dirichlet(np.ones(m), size=n).astype(np.float32)
    gt = q.argmax(-1)
    perfect = np.eye(m, dtype=np.float32)[gt]
    # objectives prefer the perfect labeling
    assert float(log_likelihood(jnp.asarray(perfect), jnp.asarray(gt))) > float(
        log_likelihood(jnp.asarray(q), jnp.asarray(gt))
    )
    assert float(intersection_over_union(jnp.asarray(perfect), jnp.asarray(gt))) > float(
        intersection_over_union(jnp.asarray(q), jnp.asarray(gt))
    )
    assert np.isfinite(float(hamming(jnp.asarray(q), jnp.asarray(gt))))
    # ignored labels don't contribute
    gt2 = gt.copy()
    gt2[:10] = -1
    assert np.isfinite(float(log_likelihood(jnp.asarray(q), jnp.asarray(gt2))))


def test_minimize_lbfgs_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])

    def f(x):
        return jnp.sum((x - target) ** 2)

    x = minimize_lbfgs(f, jnp.zeros(3), max_iters=50)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-4)


def test_pydensecrf_compat():
    rng = np.random.default_rng(5)
    h, w, m = 6, 7, 4
    probs = rng.dirichlet(np.ones(m), size=h * w).astype(np.float32).reshape(h, w, m)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    out = dense_crf(probs, img, n_iters=3)
    assert out.shape == (h, w, m)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    # faithful_bug reproduces the reference's dead-code behavior
    np.testing.assert_array_equal(dense_crf(probs, img, faithful_bug=True), probs)


def test_normalization_modes_match_numpy_oracle():
    """NO/BEFORE/AFTER/SYMMETRIC filter normalizations (pairwise.cpp:40-80,
    forward path) against an independent numpy mean-field oracle."""
    rng = np.random.default_rng(7)
    h, w, m = 4, 5, 3
    n = h * w
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    probs = rng.dirichlet(np.ones(m), size=n).astype(np.float32)

    for ntype in ("no", "before", "after", "symmetric"):
        crf = DenseCRF(w, h, m)
        crf.set_unary_energy(-probs.ravel())
        crf.add_pairwise_gaussian(3, 3, PottsCompatibility(3), normalization=ntype)
        crf.add_pairwise_bilateral(
            8, 8, 13, 13, 13, image, PottsCompatibility(10), normalization=ntype
        )
        got = crf.inference(n_iters=3).reshape(n, m)

        # numpy oracle: dense K from features, mode-specific normalization
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        feats = [
            np.stack([xx.ravel() / 3.0, yy.ravel() / 3.0], -1),
            np.concatenate(
                [
                    np.stack([xx.ravel() / 8.0, yy.ravel() / 8.0], -1),
                    image.reshape(n, 3) / 13.0,
                ],
                -1,
            ),
        ]
        weights = [3.0, 10.0]
        q = np.exp(probs) / np.exp(probs).sum(-1, keepdims=True)
        # start_inference: softmax of -unary = softmax(probs)
        for _ in range(3):
            tmp = probs.copy()  # -unary
            for f, wgt in zip(feats, weights):
                d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
                K = np.exp(-0.5 * d2)
                deg = K.sum(1)
                if ntype == "symmetric":
                    filt = (K @ (q / np.sqrt(deg + 1e-20)[:, None]))
                    filt /= np.sqrt(deg + 1e-20)[:, None]
                elif ntype == "before":
                    filt = K @ (q / (deg + 1e-20)[:, None])
                elif ntype == "after":
                    filt = (K @ q) / (deg + 1e-20)[:, None]
                else:
                    filt = K @ q
                tmp += wgt * filt  # subtract Potts(-w*filt)
            e = np.exp(tmp - tmp.max(-1, keepdims=True))
            q = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(got, q, rtol=2e-4, atol=2e-5)


def test_unary_energy_classes():
    """ConstUnaryEnergy / LogisticUnaryEnergy (unary.cpp:42-70): get(),
    column-major parameter layout, and gradient(b) == autodiff of
    sum(b * (L @ f)) w.r.t. L."""
    import jax
    from dsrg_tpu.ops.crf.api import ConstUnaryEnergy, LogisticUnaryEnergy

    rng = np.random.default_rng(3)
    m, fdim, n = 4, 5, 7
    L = rng.normal(size=(m, fdim)).astype(np.float32)
    f = rng.normal(size=(fdim, n)).astype(np.float32)
    b = rng.normal(size=(m, n)).astype(np.float32)

    e = LogisticUnaryEnergy(L, f)
    np.testing.assert_allclose(e.get(), L @ f, rtol=1e-6)

    # parameter vector round-trips through the reference's column-major layout
    p = e.parameters()
    e2 = LogisticUnaryEnergy(np.zeros_like(L), f)
    e2.set_parameters(p)
    np.testing.assert_array_equal(e2.L, L)

    g = e.gradient(b)
    auto = jax.grad(lambda Lj: jnp.sum(jnp.asarray(b) * (Lj @ jnp.asarray(f))))(
        jnp.asarray(L)
    )
    np.testing.assert_allclose(
        g, np.asarray(auto).reshape(-1, order="F"), rtol=1e-5, atol=1e-6
    )

    c = ConstUnaryEnergy(L @ f)
    np.testing.assert_allclose(c.get(), L @ f)
    assert c.parameters().size == 0

    # set_unary plumbs a class-major energy into the pixel-major engine
    crf = DenseCRF(n, 1, m)
    crf.set_unary(e)
    np.testing.assert_allclose(np.asarray(crf._unary_cost), (L @ f).T, rtol=1e-6)
