"""Detector tests: ROI align numerics, forward shapes, training, det_vid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, box_proto, make_video, write_frames
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.heads import roi_align
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.train import (
    assign_targets,
    detector_loss,
    init_train_state,
    make_optimizer,
    make_training_batch,
    train_step,
)

IMAGE_HW = (96, 128)
MAX_ROIS = 16
NUM_CLASSES = 4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = detector_preset("tiny", num_classes=NUM_CLASSES)
    return init_detector(cfg, IMAGE_HW, max_rois=MAX_ROIS, seed=0)


def test_roi_align_constant_map():
    """On a constant feature map every pooled value equals the constant."""
    feat = jnp.full((8, 10, 3), 2.5, jnp.float32)
    boxes = jnp.array([[16.0, 16.0, 100.0, 80.0], [0.0, 0.0, 150.0, 120.0]])
    pooled = roi_align(feat, boxes, stride=16, pool=4)
    assert pooled.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(pooled), 2.5, rtol=1e-5)


def test_roi_align_fused_matches_separable():
    """The two matmul layouts are the same bilinear sampling (float-order only)."""
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(15, 20, 64)).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 200, 8),
                rng.uniform(0, 150, 8),
                rng.uniform(200, 319, 8),
                rng.uniform(150, 239, 8),
            ],
            axis=1,
        ).astype(np.float32)
    )
    a = roi_align(feat, boxes, stride=16, pool=7, fused=True)
    b = roi_align(feat, boxes, stride=16, pool=7, fused=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_roi_align_gradient_map():
    """On feat[y, x] = x, pooled columns must increase and match bin centers."""
    H, W = 8, 12
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :, None], (H, W, 1))
    # ROI covering feature cols 2..6 (pixel coords = *16)
    box = jnp.array([[2 * 16.0, 1 * 16.0, 6 * 16.0, 5 * 16.0]])
    pooled = roi_align(xs, box, stride=16, pool=4)[0, :, :, 0]  # (P, P)
    # bin centers along x: 2 + (p+0.5)*1 - 0.5 → 2.0, 3.0, 4.0, 5.0
    np.testing.assert_allclose(np.asarray(pooled[0]), [2.0, 3.0, 4.0, 5.0], atol=1e-4)
    # rows identical (no y variation)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(pooled[-1]), atol=1e-5)


def test_forward_shapes(tiny_model):
    model, params = tiny_model
    H, W = IMAGE_HW
    imgs = jnp.zeros((2, H, W, 3), jnp.float32)
    rois = jnp.tile(jnp.array([[10.0, 10.0, 60.0, 60.0]]), (2, MAX_ROIS, 1))
    scores, deltas = model.apply(params, imgs, rois)
    assert scores.shape == (2, MAX_ROIS, NUM_CLASSES)
    assert deltas.shape == (2, MAX_ROIS, NUM_CLASSES, 4)
    assert scores.dtype == jnp.float32


def test_assign_targets():
    rois = jnp.array([[0.0, 0.0, 50.0, 50.0], [100.0, 100.0, 140.0, 140.0], [0.0] * 4])
    roi_mask = jnp.array([True, True, False])
    gt = jnp.array([[2.0, 2.0, 52.0, 52.0]])
    labels, targets = assign_targets(
        rois, roi_mask, gt, jnp.array([3]), jnp.array([True])
    )
    assert labels.tolist() == [3, 0, -1]  # fg, bg, padded→ignore
    assert np.abs(np.asarray(targets[0])).max() < 0.2  # near-identity deltas
    np.testing.assert_allclose(np.asarray(targets[1]), 0.0)


def test_loss_ignores_padding():
    K = 3
    scores = jnp.zeros((2, 4, K))
    deltas = jnp.zeros((2, 4, K, 4))
    labels = jnp.array([[1, 0, -1, -1], [2, -1, -1, -1]])
    targets = jnp.zeros((2, 4, 4))
    loss, aux = detector_loss(scores, deltas, labels, targets)
    # uniform logits → CE = log K over the 4 valid rois
    np.testing.assert_allclose(float(aux["cls_loss"]), np.log(K), rtol=1e-4)
    np.testing.assert_allclose(float(aux["reg_loss"]), 0.0, atol=1e-6)


def test_training_reduces_loss(tiny_model):
    model, params = tiny_model
    sv = make_video(
        SynthConfig(num_frames=8, height=IMAGE_HW[0], width=IMAGE_HW[1], seed=1)
    )
    from dataclasses import dataclass

    @dataclass
    class Opts:
        batch_size: int = 2
        max_rois: int = MAX_ROIS

    rng = np.random.default_rng(0)
    tx = make_optimizer(1e-3)
    # train_step donates the state, so train on a private copy — the fixture's
    # params are shared with other tests.
    state = init_train_state(model, jax.tree.map(jnp.copy, params), tx)
    losses = []
    for _ in range(10):
        batch = make_training_batch(sv, rng, Opts(), NUM_CLASSES)
        state, aux = train_step(model, state, tx, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_cosine_schedule_optimizer(tiny_model):
    """make_optimizer(schedule="cosine") trains and actually decays the lr."""
    import optax

    model, params = tiny_model
    sv = make_video(
        SynthConfig(num_frames=8, height=IMAGE_HW[0], width=IMAGE_HW[1], seed=1)
    )
    from dataclasses import dataclass

    @dataclass
    class Opts:
        batch_size: int = 2
        max_rois: int = MAX_ROIS

    with pytest.raises(AssertionError):
        make_optimizer(1e-3, schedule="cosine")  # needs total_steps
    tx = make_optimizer(1e-3, schedule="cosine", total_steps=20)
    rng = np.random.default_rng(0)
    state = init_train_state(model, jax.tree.map(jnp.copy, params), tx)
    for _ in range(3):
        batch = make_training_batch(sv, rng, Opts(), NUM_CLASSES)
        state, aux = train_step(model, state, tx, batch)
    assert np.isfinite(float(aux["loss"]))
    # the schedule itself: warmup (1 step at total=20) then decay to lr/100
    sched = optax.warmup_cosine_decay_schedule(
        1e-4, 1e-3, warmup_steps=1, decay_steps=20, end_value=1e-5
    )
    assert float(sched(0)) < float(sched(1))
    np.testing.assert_allclose(float(sched(20)), 1e-5, rtol=1e-5)


def test_det_vid_end_to_end(tiny_model, tmp_path):
    """Config 2: vid_proto + box_proto → det_proto through the real stage."""
    model, params = tiny_model
    sv = make_video(
        SynthConfig(
            num_frames=6,
            height=IMAGE_HW[0],
            width=IMAGE_HW[1],
            seed=2,
            proposals_per_frame=MAX_ROIS,
        ),
        video="dv",
    )
    vid = write_frames(sv, str(tmp_path))
    bp = box_proto(sv)
    from vdetlib_tpu.video.detect import DetectOptions, det_vid

    opts = DetectOptions(
        batch_size=4,
        max_rois=MAX_ROIS,
        image_hw=IMAGE_HW,
        score_thresh=0.0,
    )
    det = det_vid(model, params, vid, bp, opts)
    assert det["video"] == "dv"
    assert len(det["detections"]) > 0
    frames = {d["frame"] for d in det["detections"]}
    assert frames <= set(sv.frame_ids)
    for d in det["detections"][:50]:
        x1, y1, x2, y2 = d["bbox"]
        assert 0 <= x1 <= IMAGE_HW[1] and 0 <= y2 <= IMAGE_HW[0] + 1
        assert d["scores"][0]["class_index"] >= 1
        assert 0.0 <= d["scores"][0]["score"] <= 1.0


def test_det_vid_device_resize(tiny_model, tmp_path):
    """Native-res frames + fused on-device resize agree with host resize."""
    model, params = tiny_model
    sv = make_video(
        SynthConfig(
            num_frames=4,
            height=2 * IMAGE_HW[0],  # native = 2x the network input
            width=2 * IMAGE_HW[1],
            seed=5,
            proposals_per_frame=MAX_ROIS,
        ),
        video="dr",
    )
    vid = write_frames(sv, str(tmp_path))
    bp = box_proto(sv)
    from vdetlib_tpu.video.detect import DetectOptions, det_vid

    base = dict(batch_size=2, max_rois=MAX_ROIS, image_hw=IMAGE_HW, score_thresh=0.0)
    det_host = det_vid(model, params, vid, bp, DetectOptions(**base))
    det_dev = det_vid(
        model, params, vid, bp, DetectOptions(**base, device_resize=True)
    )
    assert len(det_dev["detections"]) > 0
    # same (frame, class) population; boxes agree loosely (the two resize
    # kernels differ: cv2 INTER_AREA vs 2-tap bilinear)
    def keyset(d):
        return {(x["frame"], x["scores"][0]["class_index"]) for x in d["detections"]}

    common = keyset(det_host) & keyset(det_dev)
    assert len(common) > 0.5 * len(keyset(det_host))


def test_det_vid_pyramid(tiny_model, tmp_path):
    """Multi-scale pyramid scoring: scores are max over scales ≥ single-scale."""
    model, params = tiny_model
    sv = make_video(
        SynthConfig(
            num_frames=4, height=IMAGE_HW[0], width=IMAGE_HW[1], seed=6,
            proposals_per_frame=MAX_ROIS,
        ),
        video="pyr",
    )
    vid = write_frames(sv, str(tmp_path))
    bp = box_proto(sv)
    from vdetlib_tpu.video.detect import DetectOptions, det_vid

    base = dict(batch_size=2, max_rois=MAX_ROIS, image_hw=IMAGE_HW, score_thresh=0.0)
    single = det_vid(model, params, vid, bp, DetectOptions(**base))
    pyr = det_vid(
        model, params, vid, bp, DetectOptions(**base, pyramid=(0.75, 1.0, 1.25))
    )
    assert len(pyr["detections"]) > 0

    def best_by_key(proto):
        out = {}
        for d in proto["detections"]:
            for s in d["scores"]:
                k = (d["frame"], s["class_index"])
                out[k] = max(out.get(k, 0.0), s["score"])
        return out

    b_single, b_pyr = best_by_key(single), best_by_key(pyr)
    common = set(b_single) & set(b_pyr)
    assert common
    # pyramid max-pooling can only raise the best score per (frame, class)
    raised = sum(b_pyr[k] + 1e-5 >= b_single[k] for k in common)
    assert raised == len(common)


def test_checkpoint_roundtrip(tiny_model, tmp_path):
    model, params = tiny_model
    from vdetlib_tpu.pipeline.checkpoint import load_params, save_params

    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, template=params)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
