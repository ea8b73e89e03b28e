"""Tracker training: loss decreases; long-video (config 3) tracking runs."""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.nn.tracker_train import (
    make_tracker_batch,
    response_and_target,
    train_tracker,
)
from vdetlib_tpu.video.track import init_tracker, track_batch, tracker_features

HW = (96, 128)


def test_target_peaks_at_gt_displacement():
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=HW, seed=0)
    sv = make_video(SynthConfig(num_frames=4, height=HW[0], width=HW[1], seed=1))
    feats = tracker_features(model, params, jnp.asarray(sv.frames[:2]))
    box_a = jnp.asarray(sv.gt_boxes[0, 0])
    box_b = jnp.asarray(sv.gt_boxes[0, 1])
    resp, target, in_range = response_and_target(feats[0], feats[1], box_a, box_b, cfg)
    R = cfg.search_pool - cfg.template_pool + 1
    assert resp.shape == (R, R) and target.shape == (R, R)
    assert bool(in_range)
    np.testing.assert_allclose(float(target.sum()), 1.0, rtol=1e-5)
    # identity pair → target at the center bin
    _, t0, _ = response_and_target(feats[0], feats[0], box_a, box_a, cfg)
    c = np.unravel_index(np.asarray(t0).argmax(), t0.shape)
    assert c == ((R - 1) // 2, (R - 1) // 2)


def test_training_reduces_loss():
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=HW, seed=0)
    videos = [
        make_video(SynthConfig(num_frames=8, height=HW[0], width=HW[1], seed=50 + i))
        for i in range(2)
    ]
    from vdetlib_tpu.nn.tracker_train import TrackerTrainState, tracker_train_step
    import optax
    import jax

    tx = optax.adamw(1e-3)
    params = jax.tree.map(jnp.copy, params)
    state = TrackerTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(15):
        batch = make_tracker_batch(videos, rng, 4)
        state, aux = tracker_train_step(model, cfg, tx, state, batch)
        losses.append(float(aux["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_aware_batch_invariants():
    """The aware sampler's contract (VERDICT r4 item 4): suppression
    samples are truly evidence-free, match samples have clean anchors, and
    the batch actually contains hard content (negatives near windows AND
    at least one suppression sample) — asserted so fixture drift can't
    hollow out the recipe (CLAUDE.md parity-blind-spot pattern)."""
    from vdetlib_tpu.data.synth import hard_config
    from vdetlib_tpu.nn.tracker_train import make_tracker_batch_aware

    cfg = TrackerConfig()
    videos = [
        make_video(hard_config(num_frames=24, height=HW[0], width=HW[1], seed=200 + i))
        for i in range(3)
    ]
    rng = np.random.default_rng(0)
    batch = make_tracker_batch_aware(videos, rng, 64, cfg)
    sup = np.asarray(batch["suppress"])
    nv = np.asarray(batch["neg_valid"])
    ba = np.asarray(batch["boxes_a"])
    bb = np.asarray(batch["boxes_b"])
    assert sup.any(), "no suppression samples drawn — tier too easy"
    assert not sup.all()
    assert nv.any(axis=1).sum() >= 16, "too few samples carry negatives"
    # anchors and targets are real boxes
    assert (ba[:, 2] > ba[:, 0]).all() and (ba[:, 3] > ba[:, 1]).all()
    assert (bb[:, 2] >= bb[:, 0]).all() and (bb[:, 3] >= bb[:, 1]).all()
    # padded negative slots are exactly zero (mask-authoritative convention)
    padded = np.asarray(batch["neg_boxes"])[~nv]
    assert (padded == 0).all()


def test_aware_training_reduces_loss_and_terms():
    """The aware loss trains: total loss decreases AND the distractor hinge
    + suppression terms are actually exercised (nonzero early)."""
    from vdetlib_tpu.data.synth import hard_config
    from vdetlib_tpu.nn.tracker_train import (
        TrackerTrainState,
        make_tracker_batch_aware,
        tracker_train_step,
    )
    import optax
    import jax

    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=HW, seed=0)
    # 24-frame seed-200 draws: occlusion is dense but INTERMITTENT, so the
    # suppression sampler can find cleaner-than-target anchors (16-frame
    # seed-60 draws are occluded >0.5 wall-to-wall — infeasible by design)
    videos = [
        make_video(hard_config(num_frames=24, height=HW[0], width=HW[1], seed=200 + i))
        for i in range(2)
    ]
    tx = optax.adamw(1e-3)
    params = jax.tree.map(jnp.copy, params)
    state = TrackerTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    losses, hinges, sups = [], [], []
    for _ in range(15):
        batch = make_tracker_batch_aware(videos, rng, 8, cfg)
        state, aux = tracker_train_step(model, cfg, tx, state, batch, recipe="aware")
        losses.append(float(aux["loss"]))
        hinges.append(float(aux["hinge"]))
        sups.append(float(aux["sup"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert max(hinges) > 0.0, "distractor hinge never fired"
    assert max(sups) > 0.0, "occlusion suppression never fired"


def test_trained_multi_scale_beats_single_scale():
    """VERDICT r1 item 6: trained features unlock the multi-scale search.

    On scale-changing videos (scale_rate > 0), TrackerNet trained with the
    self-supervised NCC objective + num_scales=3 must beat (a) the same
    trained features at num_scales=1 and (b) random features at num_scales=3
    on mean IoU vs ground truth. With random features the scale search is
    noise-limited and does nothing — the round-1 observation."""
    import jax
    from vdetlib_tpu.utils.common import iou

    def mk(seed):
        return make_video(
            SynthConfig(
                num_frames=20, height=HW[0], width=HW[1], num_objects=1,
                max_speed=1.5, seed=seed, scale_rate=0.035,
                min_size=24, max_size=40,
            )
        )

    cfg1 = TrackerConfig(num_scales=1)
    cfg3 = TrackerConfig(num_scales=3)
    model, params0 = init_tracker(cfg1, image_hw=HW, seed=0)
    params0 = jax.tree.map(np.asarray, params0)  # host copy: step donates
    params = train_tracker(
        model, cfg1, jax.tree.map(jnp.asarray, params0),
        [mk(100 + i) for i in range(3)],
        steps=60, batch_size=4, seed=0, log_every=1000,
    )

    def mean_iou(cfg, p):
        vals = []
        for seed in (7, 8, 9):
            sv = mk(seed)
            feats = tracker_features(
                model, jax.tree.map(jnp.asarray, p), jnp.asarray(sv.frames)
            )
            boxes, _conf, alive = track_batch(
                model, cfg, feats, jnp.asarray([0]),
                jnp.asarray(sv.gt_boxes[:1, 0]), 0.1,
            )
            b, a = np.asarray(boxes)[0], np.asarray(alive)[0]
            vals += [
                iou([b[t]], [sv.gt_boxes[0, t]])[0, 0]
                for t in range(len(b)) if a[t]
            ]
        return float(np.mean(vals))

    iou_1scale = mean_iou(cfg1, params)
    iou_3scale = mean_iou(cfg3, params)
    iou_3scale_random = mean_iou(cfg3, params0)
    # measured: trained 3s=0.670, trained 1s=0.562, random 3s=0.559
    assert iou_3scale > iou_1scale + 0.05
    assert iou_3scale > iou_3scale_random + 0.05


def test_long_video_tracking_300_frames():
    """Config 3 (BASELINE.json:9): 300-frame video, single scan program."""
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=HW, seed=0)
    sv = make_video(
        SynthConfig(num_frames=300, height=HW[0], width=HW[1], seed=7, max_speed=2.0)
    )
    feats = tracker_features(model, params, jnp.asarray(sv.frames))
    boxes, conf, alive = track_batch(
        model, cfg, feats, jnp.asarray([150]), jnp.asarray(sv.gt_boxes[:1, 150]), 0.2
    )
    alive = np.asarray(alive)[0]
    assert alive.sum() > 200  # survives most of the video
    assert alive[0] or alive[1]  # reached the start (backward scan)
    assert alive[-1] or alive[-2]  # reached the end (forward scan)
