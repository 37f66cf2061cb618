"""Stage-2 retraining step: plain DeepLab training on pseudo ground truth.

Reference: ``train-f.prototxt`` — ImageSegDataLayer batch 10 @ 321^2 crops,
backbone + heads, ``Interp`` shrink x8 of the label map, ``SoftmaxWithLoss``
with ignore_label 255, ``SegAccuracy``; poly-lr Caffe SGD
(``solver-f.prototxt``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from dsrg_tpu.config import Stage2Config
from dsrg_tpu.losses import softmax_cross_entropy_ignore_sums
from dsrg_tpu.ops.interp import caffe_interp_shrink
from dsrg_tpu.train.optimizer import caffe_sgd, lr_poly
from dsrg_tpu.train.train_state import TrainState


def make_optimizer(cfg: Stage2Config) -> optax.GradientTransformation:
    return caffe_sgd(
        lr_poly(cfg.base_lr, cfg.power, cfg.max_iter),
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        clip_gradients=cfg.clip_gradients,
    )


def make_stage2_step(
    model,
    cfg: Stage2Config,
    tx: optax.GradientTransformation,
    axis_name: str | None = None,
    extra_vars: dict | None = None,
):
    """batch: images (B, H, W, 3) float32; labels (B, H, W) int32 (255 = ignore).

    Optional ``pad_mask`` (B,) {1,0}: rows added to even out an uneven global
    batch over the mesh (the reference's batch 10 on 8 chips) are forced to
    all-ignore labels, so they drop out of the VALID-normalized loss exactly.
    Loss/accuracy reduce as psum(sum)/psum(count) — the exact global VALID
    normalization even when shards carry different ignore-pixel counts
    (Caffe's SoftmaxWithLoss normalization, train-f.prototxt:732-744).
    """

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        base_rng = state.rng
        if axis_name is not None:
            base_rng = jax.random.fold_in(base_rng, jax.lax.axis_index(axis_name))
        rng, _ = jax.random.split(state.rng)
        _, drop_rng, flip_rng = jax.random.split(base_rng, 3)
        if cfg.fast_dropout_rng:
            drop_seed = jax.random.randint(drop_rng, (), 0, jnp.iinfo(jnp.int32).max)
            drop_rng = jax.random.key(drop_seed, impl="rbg")
        from dsrg_tpu.train.stage1 import _device_normalize

        images = _device_normalize(batch["images"])
        labels = batch["labels"]

        if cfg.mirror:
            # joint random horizontal flip of image + label
            # (SimpleTransformer, layer.py:231-236)
            flip = jax.random.bernoulli(flip_rng, 0.5, (images.shape[0],))
            images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
            labels = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)

        # Interp shrink x8 on the integer label map (lossless subsampling at
        # the recipe's 321 -> 41 geometry, see ops/interp.py).
        small = caffe_interp_shrink(
            labels[..., None].astype(jnp.float32), cfg.shrink_factor
        )[..., 0].astype(jnp.int32)
        pad_mask = batch.get("pad_mask")
        if pad_mask is not None:
            small = jnp.where(
                pad_mask[:, None, None] > 0, small, cfg.ignore_label
            )

        def loss_fn(params):
            variables = {"params": params, **(extra_vars or {})}
            scores = model.apply(
                variables, images, train=True, rngs={"dropout": drop_rng}
            )
            loss_sum, acc_sum, n_valid = softmax_cross_entropy_ignore_sums(
                scores, small, cfg.ignore_label
            )
            return loss_sum, (acc_sum, n_valid)

        (loss_sum, (acc_sum, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads, loss_sum, acc_sum, n_valid = jax.lax.psum(
                (grads, loss_sum, acc_sum, n_valid), axis_name
            )
        inv = 1.0 / jnp.maximum(n_valid, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        acc = acc_sum * inv
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "accuracy": acc,
                   "grad_norm": optax.global_norm(grads)}
        new_state = state.replace(
            params=params, opt_state=opt_state, rng=rng, step=state.step + 1
        )
        return new_state, metrics

    return train_step


def init_stage2(model, cfg: Stage2Config, rng=None):
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    init_rng, state_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    variables = model.init({"params": init_rng}, dummy, train=False)
    tx = make_optimizer(cfg)
    state = TrainState.create(variables["params"], tx, state_rng)
    extra_vars = {k: v for k, v in variables.items() if k != "params"}
    return state, tx, extra_vars
