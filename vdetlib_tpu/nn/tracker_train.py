"""Tracker training — self-supervised correlation learning.

The reference's FCN tracker ran on externally pre-trained features
(Caffe/MATLAB, SURVEY.md §2.2); this makes the rebuild self-contained: train
TrackerNet so that the template↔search NCC response peaks at the true
displacement. Supervision comes from known motion (synthetic ground truth
now; any tracked dataset later) — per (frame t, frame t+δ, box) sample, the
response map over the search window is trained with cross-entropy against a
Gaussian placed at the ground-truth displacement bin.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vdetlib_tpu.nn.tracker_net import (
    TrackerConfig,
    TrackerNet,
    correlate,
    extract_template,
    search_window,
)


class TrackerTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def response_and_target(feats_a, feats_b, box_a, box_b, cfg: TrackerConfig, sigma_bins: float = 0.75):
    """One pair's response map + Gaussian target at the true displacement."""
    template = extract_template(feats_a, box_a, cfg)
    win = search_window(box_a, cfg.search_factor)
    from vdetlib_tpu.nn.heads import roi_align

    Q = cfg.search_pool
    P = cfg.template_pool
    R = Q - P + 1
    sfeat = roi_align(feats_b, win[None], stride=4, pool=Q)[0]
    resp = correlate(template, sfeat)  # (R, R)

    # ground-truth displacement in bins (window-centered)
    cxa = 0.5 * (box_a[0] + box_a[2])
    cya = 0.5 * (box_a[1] + box_a[3])
    cxb = 0.5 * (box_b[0] + box_b[2])
    cyb = 0.5 * (box_b[1] + box_b[3])
    wx = (win[2] - win[0]) / Q
    wy = (win[3] - win[1]) / Q
    gx = (cxb - cxa) / wx + (R - 1) / 2.0
    gy = (cyb - cya) / wy + (R - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (R, R), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (R, R), 1)
    target = jnp.exp(-((ys - gy) ** 2 + (xs - gx) ** 2) / (2 * sigma_bins**2))
    target = target / jnp.maximum(target.sum(), 1e-6)
    in_range = (gx >= 0) & (gx <= R - 1) & (gy >= 0) & (gy <= R - 1)
    return resp, target, in_range


def tracker_loss(model: TrackerNet, cfg: TrackerConfig, params, batch, logit_scale: float = 10.0):
    """batch: frames_a/b (B,H,W,3) u8, boxes_a/b (B,4)."""
    xa = batch["frames_a"].astype(jnp.float32) / 255.0 - 0.5
    xb = batch["frames_b"].astype(jnp.float32) / 255.0 - 0.5
    fa = model.apply(params, xa)
    fb = model.apply(params, xb)

    def one(feats_a, feats_b, box_a, box_b):
        resp, target, in_range = response_and_target(feats_a, feats_b, box_a, box_b, cfg)
        logp = jax.nn.log_softmax((resp * logit_scale).reshape(-1))
        ce = -jnp.sum(target.reshape(-1) * logp)
        return jnp.where(in_range, ce, 0.0), in_range

    ces, valid = jax.vmap(one)(fa, fb, batch["boxes_a"], batch["boxes_b"])
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(ces) / n, {"n_valid": n}


@functools.partial(jax.jit, static_argnames=("model", "cfg", "tx"), donate_argnums=(3,))
def tracker_train_step(model, cfg, tx, state: TrackerTrainState, batch):
    def loss_fn(p):
        return tracker_loss(model, cfg, p, batch)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrackerTrainState(new_params, new_opt, state.step + 1), dict(aux, loss=loss)


def make_tracker_batch(videos, rng: np.random.Generator, batch_size: int, max_dt: int = 3):
    """Sample (frame pair, box pair) tuples from SynthVideos."""
    fa, fb, ba, bb = [], [], [], []
    for _ in range(batch_size):
        sv = videos[int(rng.integers(0, len(videos)))]
        K, T = sv.gt_boxes.shape[:2]
        k = int(rng.integers(0, K))
        dt = int(rng.integers(1, max_dt + 1))
        t = int(rng.integers(0, T - dt))
        fa.append(sv.frames[t])
        fb.append(sv.frames[t + dt])
        ba.append(sv.gt_boxes[k, t])
        bb.append(sv.gt_boxes[k, t + dt])
    return {
        "frames_a": jnp.asarray(np.stack(fa)),
        "frames_b": jnp.asarray(np.stack(fb)),
        "boxes_a": jnp.asarray(np.stack(ba)),
        "boxes_b": jnp.asarray(np.stack(bb)),
    }


def train_tracker(
    model: TrackerNet,
    cfg: TrackerConfig,
    params,
    videos,
    steps: int = 200,
    batch_size: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
):
    from vdetlib_tpu.utils.log import get_logger

    log = get_logger("train_tracker")
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))
    state = TrackerTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(seed)
    for step in range(steps):
        batch = make_tracker_batch(videos, rng, batch_size)
        state, aux = tracker_train_step(model, cfg, tx, state, batch)
        if step % log_every == 0 or step == steps - 1:
            log.info("step %d loss=%.4f", step, float(aux["loss"]))
    return state.params
