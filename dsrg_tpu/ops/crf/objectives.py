"""CRF parameter-learning objectives and L-BFGS driver.

JAX equivalents of the reference's (unlinked) CRF-learning side
(``CRF/src/objective.cpp:37-109``, ``CRF/src/optimization.cpp``): objectives
map marginals Q (N, M) + ground truth to a scalar (gradients come free from
``jax.grad`` instead of the hand-written "value + d*Q" forms), and
``minimize_lbfgs`` replaces the liblbfgs driver with ``optax.lbfgs``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def log_likelihood(q: jnp.ndarray, gt: jnp.ndarray, robust: float = 0.0) -> jnp.ndarray:
    """Mean log-likelihood of the ground-truth labels under Q.

    gt: (N,) int labels; negative labels are ignored (objective.cpp:37-56).
    ``robust`` adds a floor inside the log, as the reference's robust variant.
    """
    valid = gt >= 0
    safe = jnp.where(valid, gt, 0)
    picked = jnp.take_along_axis(q, safe[:, None], axis=1)[:, 0]
    ll = jnp.log(picked + robust)
    return jnp.sum(jnp.where(valid, ll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def hamming(
    q: jnp.ndarray, gt: jnp.ndarray, class_weight_pow: float = 1.0
) -> jnp.ndarray:
    """Class-weighted expected Hamming score (objective.cpp:58-87).

    Weights are inverse class-frequency raised to ``class_weight_pow`` and
    normalized; returns sum_i w[gt_i] * Q_i[gt_i].
    """
    m = q.shape[1]
    valid = gt >= 0
    safe = jnp.where(valid, gt, 0)
    counts = jnp.bincount(safe, weights=valid.astype(q.dtype), length=m)
    w = jnp.where(counts > 0, counts ** (-class_weight_pow), 0.0)
    w = w / jnp.maximum(jnp.sum(w * counts), 1e-20)
    picked = jnp.take_along_axis(q, safe[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.where(valid, w[safe] * picked, 0.0))


def intersection_over_union(q: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU objective (objective.cpp:89-109): mean over classes of
    intersection/union with Q as soft assignment."""
    m = q.shape[1]
    valid = (gt >= 0).astype(q.dtype)[:, None]
    onehot = jax.nn.one_hot(jnp.where(gt >= 0, gt, 0), m, dtype=q.dtype) * valid
    inter = jnp.sum(q * onehot, axis=0)
    union = jnp.sum(q * valid + onehot - q * onehot, axis=0)
    return jnp.mean(inter / (union + 1e-20))


def minimize_lbfgs(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iters: int = 100,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Minimize ``fn`` with optax L-BFGS (optimization.cpp:28-101 equivalent)."""
    opt = optax.lbfgs()
    value_and_grad = jax.value_and_grad(fn)

    def step(carry):
        x, state, _ = carry
        value, grad = value_and_grad(x)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fn)
        return optax.apply_updates(x, updates), state, jnp.linalg.norm(grad)

    x, state = x0, opt.init(x0)
    gnorm = jnp.inf
    for _ in range(max_iters):
        x, state, gnorm = step((x, state, gnorm))
        if float(gnorm) < tol:
            break
    return x


def numeric_gradient(fn: Callable, x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Central-difference gradient (optimization.cpp:103-114 gradCheck helper)."""
    flat = x.reshape(-1)
    grads = []
    for i in range(flat.shape[0]):
        xp = flat.at[i].add(eps).reshape(x.shape)
        xm = flat.at[i].add(-eps).reshape(x.shape)
        grads.append((fn(xp) - fn(xm)) / (2 * eps))
    return jnp.asarray(grads).reshape(x.shape)
