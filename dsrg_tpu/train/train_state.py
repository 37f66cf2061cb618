"""Minimal train state container (params + optimizer state + PRNG)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng):
        return cls(
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            step=jnp.zeros([], jnp.int32),
        )
