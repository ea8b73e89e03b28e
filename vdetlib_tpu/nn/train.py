"""Detector training — Fast R-CNN losses, target assignment, sharded steps.

The reference never trained anything (weights were external .caffemodel
files; SURVEY.md §5.4); training is a framework capability added so the stack
is self-contained. Losses are the standard Fast R-CNN pair: softmax
cross-entropy over classes + smooth-L1 on encoded box deltas for foreground
ROIs. The train step is written for a ``jax.sharding.Mesh``: batch sharded
along ``data``, params replicated — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vdetlib_tpu.geometry.boxes import encode_deltas, pairwise_iou
from vdetlib_tpu.nn.detector import Detector, preprocess_images


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def assign_targets(rois, roi_mask, gt_boxes, gt_classes, gt_mask, fg_thresh=0.5):
    """Per-ROI training targets (jnp, vmappable over the frame axis).

    Args:
      rois: (R, 4); roi_mask: (R,) bool.
      gt_boxes: (G, 4) padded; gt_classes: (G,) int; gt_mask: (G,) bool.
    Returns:
      labels (R,) int32 — gt class for IoU≥fg_thresh else 0 (background),
      -1 for padded ROI slots (ignored in the loss);
      bbox_targets (R, 4) encoded deltas to the matched gt (zeros for bg).
    """
    iou = pairwise_iou(rois, gt_boxes)  # (R, G)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)  # (R,)
    best_iou = jnp.max(iou, axis=1)
    matched_boxes = gt_boxes[best_gt]
    matched_classes = gt_classes[best_gt]
    fg = best_iou >= fg_thresh
    labels = jnp.where(fg, matched_classes, 0)
    labels = jnp.where(roi_mask, labels, -1)
    bbox_targets = encode_deltas(rois, matched_boxes)
    bbox_targets = jnp.where(fg[:, None], bbox_targets, 0.0)
    return labels.astype(jnp.int32), bbox_targets


def smooth_l1(x, beta: float = 1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def detector_loss(scores, deltas, labels, bbox_targets, bbox_weight: float = 1.0):
    """Fast R-CNN loss over a padded ROI batch.

    scores: (..., R, K); deltas: (..., R, K, 4); labels: (..., R) with -1 =
    ignore; bbox_targets: (..., R, 4).
    """
    valid = labels >= 0
    labels_c = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    cls_ll = jnp.take_along_axis(logp, labels_c[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    cls_loss = -jnp.sum(jnp.where(valid, cls_ll, 0.0)) / n_valid

    fg = labels > 0
    picked = jnp.take_along_axis(
        deltas, labels_c[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]  # (..., R, 4)
    reg = jnp.sum(smooth_l1(picked - bbox_targets), axis=-1)
    n_fg = jnp.maximum(jnp.sum(fg), 1)
    reg_loss = jnp.sum(jnp.where(fg, reg, 0.0)) / n_fg
    return cls_loss + bbox_weight * reg_loss, {
        "cls_loss": cls_loss,
        "reg_loss": reg_loss,
        "n_fg": n_fg,
    }


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    schedule: str = "const",
    total_steps: int = 0,
):
    """AdamW + global-norm clip; ``schedule="cosine"`` decays lr to lr/100
    over ``total_steps`` after a 5% linear warmup (the round-5 recipe probe:
    longer schedules need decay — the constant-lr 2400-step run measured
    weaker held-out than 1200, RESULTS.md round 3)."""
    if schedule == "cosine":
        assert total_steps > 0, "cosine schedule needs total_steps"
        warmup = max(1, total_steps // 20)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=lr / 10,
            peak_value=lr,
            warmup_steps=warmup,
            decay_steps=total_steps,
            end_value=lr / 100,
        )
    elif schedule != "const":
        raise ValueError(f"unknown lr schedule: {schedule}")
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(model: Detector, variables, tx) -> TrainState:
    return TrainState(
        params=variables, opt_state=tx.init(variables), step=jnp.zeros((), jnp.int32)
    )


@functools.partial(jax.jit, static_argnames=("model", "tx"), donate_argnums=(1,))
def train_step(model: Detector, state: TrainState, tx, batch) -> tuple[TrainState, dict]:
    """One optimizer step.

    batch: dict with images_u8 (B,H,W,3), rois (B,R,4), labels (B,R),
    bbox_targets (B,R,4). Under a mesh, shard the batch along 'data' and keep
    params replicated; XLA adds the psum for the grads.
    """

    def loss_fn(params):
        images = preprocess_images(batch["images_u8"], model.config)
        scores, deltas = model.apply(params, images, batch["rois"], train=True)
        return detector_loss(scores, deltas, batch["labels"], batch["bbox_targets"])

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    aux = dict(aux, loss=loss)
    return TrainState(new_params, new_opt, state.step + 1), aux


def augment_photometric(images: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-image brightness/contrast/channel-gain jitter + sensor noise.

    uint8 (B, H, W, 3) → uint8. Breaks the detector's ability to memorize
    absolute colors of individual training objects (the round-1 overfit
    mode) while preserving spatial structure.
    """
    B = images.shape[0]
    out = images.astype(np.float32)
    gain = rng.uniform(0.7, 1.3, size=(B, 1, 1, 1)).astype(np.float32)
    bias = rng.uniform(-25, 25, size=(B, 1, 1, 1)).astype(np.float32)
    ch_gain = rng.uniform(0.85, 1.15, size=(B, 1, 1, 3)).astype(np.float32)
    out = out * gain * ch_gain + bias
    out += rng.normal(0, 4.0, size=out.shape).astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def make_training_batch(sv, rng: np.random.Generator, opts, num_classes: int):
    """Build one training batch from a SynthVideo (host-side, numpy).

    Samples jittered-GT + random ROIs per frame and assigns targets. With
    ``opts.augment`` (default off), applies photometric jitter + horizontal
    flips (boxes flipped consistently). Returns the dict expected by
    train_step.
    """
    T = sv.frames.shape[0]
    B, R = opts.batch_size, opts.max_rois
    idx = rng.choice(T, size=B, replace=T < B)
    images = sv.frames[idx]
    K_gt = sv.gt_boxes.shape[0]
    rois = np.zeros((B, R, 4), np.float32)
    roi_mask = np.zeros((B, R), bool)
    gt_b = np.zeros((B, K_gt, 4), np.float32)
    gt_c = np.zeros((B, K_gt), np.int32)
    gt_m = np.ones((B, K_gt), bool)
    H, W = sv.frames.shape[1:3]
    for bi, t in enumerate(idx):
        gt_b[bi] = sv.gt_boxes[:, t]
        gt_c[bi] = sv.gt_classes
        # hard tier: don't train on evidence-free labels — out-of-view or
        # mostly-occluded boxes stay GT for EVAL, but as training targets
        # they would teach the detector to fire on occluder pixels
        gt_m[bi] = sv.gt_visible[:, t] & (sv.gt_occluded[:, t] < 0.5)
        n = 0
        # jittered gt (fg-rich) then random negatives
        while n < R:
            if n < R // 2:
                k = rng.integers(0, K_gt)
                jit = rng.normal(0, 6, size=4)
                bb = sv.gt_boxes[k, t] + jit
            else:
                x1 = rng.uniform(0, W - 8)
                y1 = rng.uniform(0, H - 8)
                bb = [x1, y1, x1 + rng.uniform(8, 120), y1 + rng.uniform(8, 120)]
            rois[bi, n] = np.clip(bb, 0, [W - 1, H - 1, W - 1, H - 1])
            roi_mask[bi, n] = True
            n += 1
    if getattr(opts, "augment", False):
        images = augment_photometric(images.copy(), rng)
        flip = rng.uniform(size=B) < 0.5
        if flip.any():
            images[flip] = images[flip, :, ::-1]
            for arr in (rois, gt_b):
                x1 = arr[flip, ..., 0].copy()
                x2 = arr[flip, ..., 2].copy()
                arr[flip, ..., 0] = (W - 1) - x2
                arr[flip, ..., 2] = (W - 1) - x1
    labels, bbox_targets = jax.vmap(assign_targets)(
        jnp.asarray(rois),
        jnp.asarray(roi_mask),
        jnp.asarray(gt_b),
        jnp.asarray(gt_c),
        jnp.asarray(gt_m),
    )
    return {
        "images_u8": jnp.asarray(images),
        "rois": jnp.asarray(rois),
        "labels": labels,
        "bbox_targets": bbox_targets,
    }
