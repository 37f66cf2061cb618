"""Dropout with 8-bit random masks.

The reference's dropout layers (``train-s.prototxt`` drop6_k/drop7_k,
rate 0.5 after each fc6/fc7 head) sit on the eight largest activations of
the stage-1 step — (B, 41, 41, 1024) x 8 at batch 20 is ~275M mask
elements per step.  ``flax.linen.Dropout`` draws a 32-bit uniform per
element, so the hardware ``RngBitGenerator`` writes ~1.1 GB of random
words to HBM every step (measured 2.05 ms of the 97 ms step,
``artifacts/step_profile_r05.json``).  A Bernoulli(p) mask only needs
8 bits: draw one uint32 word per FOUR elements, bitcast to uint8, and
keep where ``byte >= round(rate * 256)`` — an exact Bernoulli(rate) draw
whenever ``rate * 256`` is integral (it is for the reference's 0.5), and
within 1/512 of it otherwise.  4x less RNG traffic; the compare/apply
fuses as before.

This changes which pseudo-random mask a given key produces (not its
distribution); ``bits8=False`` restores flax ``nn.Dropout``'s 32-bit mask
construction (still keyed by this module's rng path).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class CaffeDropout(nn.Module):
    """Inverted dropout (Caffe semantics: scale kept units by 1/(1-rate)
    at train time, identity at test time — ``pooling/dropout_layer``), with
    an optional 8-bit mask path.

    Attributes:
      rate: drop probability (reference: 0.5).
      bits8: draw 8-bit random bytes (4x less RNG traffic) instead of
        flax's 32-bit uniforms.  Exact Bernoulli when rate*256 is integral.
    """

    rate: float
    bits8: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        if not self.bits8:
            return nn.Dropout(self.rate, deterministic=False)(x)

        thresh = int(round(self.rate * 256))
        keep_prob = 1.0 - thresh / 256.0
        rng = self.make_rng("dropout")
        # RngBitGenerator emits u8 natively — one byte per element, in the
        # element's own layout, so the compare/apply fuses with no
        # data-formatting ops.  (A u32-then-bitcast variant was measured
        # WORSE: the flat reshape materialized +15 ms/step of relayout.)
        bytes_ = jax.random.bits(rng, x.shape, jnp.uint8)
        keep = bytes_ >= jnp.uint8(thresh)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
