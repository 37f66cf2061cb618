"""Stage-1 DSRG training step — the reference's entire per-iteration pipeline
(``SURVEY.md`` §3.1) as one jit-compiled on-device program.

Per step (reference layer order, train-s.prototxt):
  joint random mirror of images+cues  (AnnotationLayer, pylayers.py:384-387)
  -> VGG16-LargeFOV forward            (conv1_1..fc8-SEC, Eltwise SUM)
  -> floored softmax                   (SoftmaxLayer)
  -> dense-CRF refinement, once        (CRFLayer + DSRGLayer.refinement fused;
                                        identical computations in the reference)
  -> seeded region growing             (DSRGLayer, gradient-free)
  -> balanced seed loss + constrain loss, both weight 1
  -> backward + Caffe-SGD momentum update (step-lr policy)

The clamp ``probs = max(probs, min_prob)`` before the CRF mirrors the
CRFLayer's in-place mutation of the shared softmax blob (pylayers.py:67) that
downstream layers (DSRG, seed loss) then observe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from dsrg_tpu.config import Stage1Config
from dsrg_tpu.losses import balanced_seed_loss_per_sample, constrain_loss_per_sample
from dsrg_tpu.ops.crf import crf_refine_with_log, crf_refine_with_log_truegrad
from dsrg_tpu.ops.grow import dsrg_grow
from dsrg_tpu.ops.softmax import MIN_PROB, clamp_straight_through, floored_softmax
from dsrg_tpu.train.optimizer import caffe_sgd, lr_step
from dsrg_tpu.train.train_state import TrainState

# BGR channel means (train-s.prototxt:14-16); used when loaders ship raw
# uint8 canvases and normalization runs on device (4x fewer host->device
# bytes than f32 — the transfer link, not HBM, is the bottleneck).
# Canonical definition lives with the data pipeline — one source of truth.
from dsrg_tpu.data.voc import BGR_MEAN  # noqa: E402


def _device_normalize(images, mean=BGR_MEAN):
    """Accept f32/f16 mean-subtracted images or raw uint8 BGR canvases.

    ``mean`` is the channel mean subtracted on the uint8 path (static at
    trace time) — VOC uses BGR_MEAN, the COCO loader ships COCO_MEAN.
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)
    return images.astype(jnp.float32)


def make_optimizer(cfg: Stage1Config) -> optax.GradientTransformation:
    return caffe_sgd(
        lr_step(cfg.base_lr, cfg.gamma, cfg.stepsize),
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        clip_gradients=cfg.clip_gradients,
    )


def make_stage1_step(
    model,
    cfg: Stage1Config,
    tx: optax.GradientTransformation,
    axis_name: str | None = None,
    extra_vars: dict | None = None,
    input_mean=BGR_MEAN,
):
    """Build the (state, batch) -> (state, metrics) step function.

    ``batch``: dict with
      images: (B, H, W, 3) float32 mean-subtracted BGR
      labels: (B, M) float32 multi-hot image labels (bit 0 = bg, always 1)
      cues:   (B, h, w, M) float32 seed cues at score resolution
      pad_mask: optional (B,) {1,0} — 0 marks batch-padding rows added so an
        uneven global batch (the reference's batch 20 on an 8-chip mesh)
        shards evenly; masked rows contribute nothing to losses, gradients,
        or metrics, so the padded step reproduces the unpadded numbers.

    With ``axis_name`` set the step is shard_map-ready: per-device RNGs are
    decorrelated by the mesh position; per-sample losses/gradients are
    weighted-sum + psum(count) reduced over the data axis — the exact global
    mean over *valid* samples regardless of per-shard counts — before the
    (replicated) optimizer update.
    """

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        base_rng = state.rng
        if axis_name is not None:
            base_rng = jax.random.fold_in(base_rng, jax.lax.axis_index(axis_name))
        rng, _ = jax.random.split(state.rng)  # advance the shared stream
        _, drop_rng, flip_rng = jax.random.split(base_rng, 3)
        if cfg.fast_dropout_rng:
            # re-key the dropout stream onto the hardware RngBitGenerator:
            # threefry mask generation for the 8 big dropout tensors costs
            # ~20 ms/step at batch 20; 'rbg' is near-free on TPU.
            drop_seed = jax.random.randint(drop_rng, (), 0, jnp.iinfo(jnp.int32).max)
            drop_rng = jax.random.key(drop_seed, impl="rbg")
        images = _device_normalize(batch["images"], input_mean)
        labels = batch["labels"]
        cues = batch["cues"].astype(jnp.float32)  # loaders may ship uint8 {0,1}
        pad_mask = batch.get("pad_mask")
        weights = (
            jnp.ones((images.shape[0],), jnp.float32)
            if pad_mask is None
            else pad_mask.astype(jnp.float32)
        )

        if cfg.mirror:
            flip = jax.random.bernoulli(flip_rng, 0.5, (images.shape[0],))
            images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
            cues = jnp.where(flip[:, None, None, None], cues[:, :, ::-1, :], cues)

        def loss_fn(params):
            variables = {"params": params, **(extra_vars or {})}
            scores = model.apply(
                variables, images, train=True, rngs={"dropout": drop_rng}
            )
            probs = floored_softmax(scores)
            # CRFLayer blob mutation: clamp values, identity gradient
            probs = clamp_straight_through(probs, MIN_PROB)
            refine = (
                crf_refine_with_log_truegrad if cfg.crf_true_grad
                else crf_refine_with_log
            )
            q_log, q = refine(
                probs, images, cfg.crf_scale_factor, cfg.crf_iters, cfg.crf_fast
            )
            cues_new = dsrg_grow(labels, cues, q, th1=cfg.th1, th2=cfg.th2)
            # weighted SUMS of per-sample losses (not means): together with
            # the psum'd valid count below this is the exact mean over valid
            # samples — shard- and padding-independent
            sum_seed = jnp.sum(weights * balanced_seed_loss_per_sample(probs, cues_new))
            sum_con = jnp.sum(weights * constrain_loss_per_sample(probs, q_log))
            return sum_seed + sum_con, (sum_seed, sum_con, cues_new)

        (loss_sum, (sum_seed, sum_con, cues_new)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        n_valid = jnp.sum(weights)
        seed_pixels = jnp.sum(cues_new * weights[:, None, None, None])
        if axis_name is not None:
            grads, loss_sum, sum_seed, sum_con, n_valid, seed_pixels = jax.lax.psum(
                (grads, loss_sum, sum_seed, sum_con, n_valid, seed_pixels), axis_name
            )
        inv = 1.0 / jnp.maximum(n_valid, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        l_seed = sum_seed * inv
        l_con = sum_con * inv

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "loss_seed": l_seed,
            "loss_constrain": l_con,
            "seed_pixels": seed_pixels,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            params=params, opt_state=opt_state, rng=rng, step=state.step + 1
        )
        return new_state, metrics

    return train_step


def init_stage1(model, cfg: Stage1Config, rng=None):
    """Initialize params + state (solver random_seed 0 by default).

    Returns ``(state, tx, extra_vars)`` where ``extra_vars`` holds
    non-trainable collections (e.g. a ResNet's frozen batch_stats) to close
    over in the step function; empty for the VGG model.
    """
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    init_rng, state_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    variables = model.init({"params": init_rng}, dummy, train=False)
    tx = make_optimizer(cfg)
    state = TrainState.create(variables["params"], tx, state_rng)
    extra_vars = {k: v for k, v in variables.items() if k != "params"}
    return state, tx, extra_vars
