"""Tracker tests: scan correctness, GT following, track_from_det (config 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import (
    SynthConfig,
    det_proto_from_gt,
    make_video,
    vid_proto_in_memory,
)
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.utils.common import iou
from vdetlib_tpu.video.track import (
    TrackOptions,
    init_tracker,
    snap_to_dets,
    track_batch,
    track_from_det,
    tracker_features,
)

T = 12
HW = (240, 320)


@pytest.fixture(scope="module")
def setup():
    sv = make_video(SynthConfig(num_frames=T, seed=0, height=HW[0], width=HW[1]))
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=HW, seed=0)
    feats = tracker_features(model, params, jnp.asarray(sv.frames))
    return sv, cfg, model, params, feats


def test_tracker_follows_gt(setup):
    sv, cfg, model, params, feats = setup
    K = sv.gt_boxes.shape[0]
    anchor_t = jnp.asarray([T // 2] * K)
    anchor_boxes = jnp.asarray(sv.gt_boxes[:, T // 2])
    boxes, conf, alive = track_batch(model, cfg, feats, anchor_t, anchor_boxes, 0.3)
    boxes, alive = np.asarray(boxes), np.asarray(alive)
    # every anchor survives with decent IoU on a majority of frames
    for k in range(K):
        assert alive[k].sum() >= T * 0.75
        ious = [
            iou(boxes[k, t : t + 1], sv.gt_boxes[k, t : t + 1])[0, 0]
            for t in range(T)
            if alive[k, t]
        ]
        assert np.mean(ious) > 0.35, (k, ious)


def test_frame_stride_tracks_close_to_stride1(setup):
    """frame_stride=2 (VERDICT r4 item 6): half the scan steps, interpolated
    skipped frames. Contract: anchor frame re-asserted exactly; per-frame
    boxes stay IoU-close to the stride-1 tracks on smooth motion; odd
    (interpolated) frames are alive only when both sampled neighbors are."""
    sv, cfg, model, params, feats = setup
    K = sv.gt_boxes.shape[0]
    anchor_t = jnp.asarray([T // 2] * K)
    anchor_boxes = jnp.asarray(sv.gt_boxes[:, T // 2])
    b1, c1, a1 = track_batch(model, cfg, feats, anchor_t, anchor_boxes, 0.3)
    b2, c2, a2 = track_batch(
        model, cfg, feats, anchor_t, anchor_boxes, 0.3, frame_stride=2
    )
    b1, a1, b2, a2 = map(np.asarray, (b1, a1, b2, a2))
    c2 = np.asarray(c2)
    for k in range(K):
        # anchor frame identity (original frame, not the snapped one)
        np.testing.assert_array_equal(b2[k, T // 2], np.asarray(anchor_boxes)[k])
        assert a2[k, T // 2] and c2[k, T // 2] == 1.0
        both = a1[k] & a2[k]
        assert both.sum() >= T * 0.5, (k, a1[k], a2[k])
        ious = [
            iou(b1[k, t : t + 1], b2[k, t : t + 1])[0, 0]
            for t in range(T) if both[t]
        ]
        assert np.mean(ious) > 0.6, (k, ious)


def test_prestrided_feats_match_full_feats(setup):
    """feats_strided contract (pipeline/fused.py skips computing features
    the strided scan never reads): passing feats[::s] + full_t must equal
    passing full-T features EXACTLY — for even and odd T (ceil rows)."""
    sv, cfg, model, params, feats = setup
    K = sv.gt_boxes.shape[0]
    for Tc in (T, T - 1):  # even + odd frame counts
        fsub = feats[:Tc]
        anchor_t = jnp.asarray([Tc // 2] * K)
        anchor_boxes = jnp.asarray(sv.gt_boxes[:, Tc // 2])
        full = track_batch(
            model, cfg, fsub, anchor_t, anchor_boxes, 0.3, frame_stride=2
        )
        pre = track_batch(
            model, cfg, fsub[::2], anchor_t, anchor_boxes, 0.3,
            frame_stride=2, feats_strided=True, full_t=Tc,
        )
        for a, b in zip(full, pre):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # misuse guards
    with pytest.raises(ValueError):
        track_batch(model, cfg, feats[::2], jnp.asarray([0] * K),
                    jnp.asarray(sv.gt_boxes[:, 0]), 0.3,
                    frame_stride=2, feats_strided=True)  # full_t missing
    with pytest.raises(ValueError):
        track_batch(model, cfg, feats, jnp.asarray([0] * K),
                    jnp.asarray(sv.gt_boxes[:, 0]), 0.3,
                    feats_strided=True)  # stride 1


def test_stride_valid_t_makes_padded_match_unpadded(setup):
    """valid_t contract (the fused engine's bucket-padded T): a stride-2
    run over pad-extended features with valid_t=T must equal the unpadded
    run EXACTLY on the real frames. Without the clamp, anchors at the last
    real frame snap onto a pad sample and end-of-video interpolation reads
    pad-frame scan outputs (the round-5 default-flip regression)."""
    sv, cfg, model, params, feats = setup
    K = sv.gt_boxes.shape[0]
    # anchor at the LAST real frame — the case whose snap rounds up
    anchor_t = jnp.asarray([T - 1] * K)
    anchor_boxes = jnp.asarray(sv.gt_boxes[:, T - 1])
    ref = track_batch(
        model, cfg, feats, anchor_t, anchor_boxes, 0.3, frame_stride=2
    )
    pad = jnp.concatenate([feats, jnp.repeat(feats[-1:], 4, axis=0)], axis=0)
    padded = track_batch(
        model, cfg, pad, anchor_t, anchor_boxes, 0.3, frame_stride=2,
        valid_t=jnp.int32(T),
    )
    for a, b in zip(ref, padded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:, :T])
    # precondition: WITHOUT valid_t the padded run must actually diverge
    # (otherwise this test stops guarding anything)
    loose = track_batch(
        model, cfg, pad, anchor_t, anchor_boxes, 0.3, frame_stride=2
    )
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b)[:, :T])
        for a, b in zip(ref, loose)
    ), "padded stride run no longer diverges without valid_t"


def test_folded_scan_matches_two_scan_form(setup):
    """track_batch folds fwd+bwd into one scan; it must equal the two-scan
    composition (_track_one_direction per direction) exactly."""
    import jax
    from vdetlib_tpu.nn.tracker_net import extract_template
    from vdetlib_tpu.video.track import _track_one_direction

    sv, cfg, model, params, feats = setup
    anchor_ts = jnp.asarray([2, T // 2, T - 2])
    anchor_boxes = jnp.asarray(
        [sv.gt_boxes[0, 2], sv.gt_boxes[1, T // 2], sv.gt_boxes[2, T - 2]]
    )

    def one(anchor_t, anchor_box):
        template = extract_template(feats[anchor_t], anchor_box, cfg)
        fb, fc, fa = _track_one_direction(
            feats, anchor_t, anchor_box, template, cfg, 0.3, reverse=False
        )
        bb, bc, ba = _track_one_direction(
            feats, anchor_t, anchor_box, template, cfg, 0.3, reverse=True
        )
        use_f = jnp.arange(T) >= anchor_t
        return (
            jnp.where(use_f[:, None], fb, bb),
            jnp.where(use_f, fc, bc),
            jnp.where(use_f, fa, ba),
        )

    ref_b, ref_c, ref_a = jax.vmap(one)(anchor_ts, anchor_boxes)
    got_b, got_c, got_a = track_batch(
        model, cfg, feats, anchor_ts, anchor_boxes, 0.3
    )
    # same math, but XLA fuses the folded form differently, so the bf16
    # pooling inside ncc_update reassociates: sub-0.05px box drift, identical
    # alive decisions.
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), atol=0.05)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=5e-3)


def test_anchor_frame_identity(setup):
    sv, cfg, model, params, feats = setup
    at = 4
    boxes, conf, alive = track_batch(
        model, cfg, feats, jnp.asarray([at]), jnp.asarray(sv.gt_boxes[:1, at]), 0.3
    )
    np.testing.assert_allclose(np.asarray(boxes)[0, at], sv.gt_boxes[0, at], atol=1e-4)
    assert float(np.asarray(conf)[0, at]) == 1.0
    assert bool(np.asarray(alive)[0, at])


def test_bidirectional_coverage(setup):
    """An anchor in the middle must produce boxes on both sides."""
    sv, cfg, model, params, feats = setup
    at = T // 2
    boxes, conf, alive = track_batch(
        model, cfg, feats, jnp.asarray([at]), jnp.asarray(sv.gt_boxes[:1, at]), 0.2
    )
    alive = np.asarray(alive)[0]
    assert alive[:at].any() and alive[at + 1 :].any()


def test_pallas_scan_matches_xla_scan(setup):
    """The Pallas tracker-scan kernel (TPU production path, interpret mode
    here) must reproduce the XLA folded scan: identical alive decisions,
    sub-0.1px box drift (bf16 pooling reassociates across formulations)."""
    import jax
    from vdetlib_tpu.nn.tracker_net import extract_template
    from vdetlib_tpu.kernels.track_pallas import track_scan_pallas

    sv, cfg, model, params, feats = setup
    anchor_ts = jnp.asarray([2, T // 2, T - 2])
    anchor_boxes = jnp.asarray(
        [sv.gt_boxes[0, 2], sv.gt_boxes[1, T // 2], sv.gt_boxes[2, T - 2]]
    )
    ref_b, ref_c, ref_a = track_batch(
        model, cfg, feats, anchor_ts, anchor_boxes, 0.3
    )  # CPU backend → XLA scan path
    templates = jax.vmap(
        lambda at, ab: extract_template(feats[at], ab, cfg)
    )(anchor_ts, anchor_boxes)
    fb, fc, fa, bb, bc, ba = track_scan_pallas(
        feats, anchor_ts, anchor_boxes, templates,
        Q=cfg.search_pool, P=cfg.template_pool, factor=cfg.search_factor,
        stride=4, conf_thresh=0.3, interpret=True,
    )
    fb, fc, fa, bb, bc, ba = (
        jnp.moveaxis(v, 0, 1) for v in (fb, fc, fa, bb, bc, ba)
    )
    use_f = jnp.arange(T)[None, :] >= anchor_ts[:, None]
    got_b = jnp.where(use_f[..., None], fb, bb)
    got_c = jnp.where(use_f, fc, bc)
    got_a = jnp.where(use_f, fa, ba)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
    live = np.asarray(ref_a)
    db = np.abs(np.asarray(got_b) - np.asarray(ref_b))[live]
    dc = np.abs(np.asarray(got_c) - np.asarray(ref_c))[live]
    assert db.max() < 0.1, db.max()
    assert dc.max() < 5e-3, dc.max()


def test_multi_scale_tracking_runs(setup):
    """Scale-adaptive tracking (num_scales=3) stays on target.

    With untrained features scale selection is noisy, so this asserts
    functionality (alive + reasonable IoU), not superiority over
    single-scale — that needs trained TrackerNet features.
    """
    sv, _, model, params, feats = setup
    cfg3 = TrackerConfig(num_scales=3)
    boxes, conf, alive = track_batch(
        model, cfg3, feats, jnp.asarray([0]), jnp.asarray(sv.gt_boxes[:1, 0]), 0.2
    )
    boxes, alive = np.asarray(boxes), np.asarray(alive)
    assert alive[0].sum() >= T * 0.5
    ious = [
        iou(boxes[0, t : t + 1], sv.gt_boxes[0, t : t + 1])[0, 0]
        for t in range(T)
        if alive[0, t]
    ]
    assert np.mean(ious) > 0.3


def test_track_from_det_end_to_end(setup):
    """Config 3: det_proto anchors → track_proto via greedy rounds."""
    sv, cfg, model, params, _ = setup
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=2)
    opts = TrackOptions(max_tracks=8, anchors_per_round=4, image_hw=HW)
    tp = track_from_det(
        model, params, vid, det, cfg, opts, frames_u8=sv.frames
    )
    assert tp["video"] == sv.video
    assert 1 <= len(tp["tracks"]) <= 8
    # every track is frame-sorted with valid boxes and covers several frames
    for track in tp["tracks"]:
        frames = [b["frame"] for b in track]
        assert frames == sorted(frames)
        assert len(frames) >= 3
        assert all(len(b["bbox"]) == 4 for b in track)
        assert "anchor" in track[0]
    # tracks should collectively cover the GT objects reasonably:
    covered = 0
    for k in range(sv.gt_boxes.shape[0]):
        best = 0.0
        for track in tp["tracks"]:
            for b in track:
                t = b["frame"] - 1
                best = max(best, iou([b["bbox"]], sv.gt_boxes[k, t : t + 1])[0, 0])
        covered += best > 0.5
    assert covered >= 2


# ---------------------------------------------------------------------------
# Detection snapping (TrackOptions.snap_weight — round 4)
# ---------------------------------------------------------------------------


def _snap_dets_from_gt(sv, rng, N=8, dup_slot=True):
    """Per-frame det arrays: GT-jittered boxes + junk, random scores."""
    K = sv.gt_boxes.shape[0]
    det_b = np.zeros((T, N, 4), np.float32)
    det_s = rng.uniform(0.3, 1.0, size=(T, N)).astype(np.float32)
    det_v = rng.uniform(size=(T, N)) < 0.85
    for t in range(T):
        for n in range(N):
            k = n % K
            det_b[t, n] = sv.gt_boxes[k, t] + rng.normal(0, 3, 4)
    if dup_slot:
        # exact-duplicate det (score AND box): exercises the tie-break path
        det_b[:, N - 1] = det_b[:, 0]
        det_s[:, N - 1] = det_s[:, 0]
        det_v[:, N - 1] = det_v[:, 0]
    return det_b, det_s, det_v


def test_snap_permutation_invariance(setup):
    """snap_to_dets must be det-slot-permutation-invariant: the staged and
    fused engines pack the SAME det set in different slot orders and must
    snap identically (the engine-parity contract). Bitwise equality — every
    reduction in the snap rule is a masked max."""
    sv, cfg, model, params, feats = setup
    rng = np.random.default_rng(7)
    det_b, det_s, det_v = _snap_dets_from_gt(sv, rng)
    anchor_ts = jnp.asarray([2, T // 2])
    anchor_boxes = jnp.asarray([sv.gt_boxes[0, 2], sv.gt_boxes[1, T // 2]])

    def run(b, s, v):
        return track_batch(
            model, cfg, feats, anchor_ts, anchor_boxes, 0.3,
            snap=(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v)),
            snap_iou=0.4, snap_weight=0.5,
        )

    b1, c1, a1 = run(det_b, det_s, det_v)
    perm = rng.permutation(det_b.shape[1])
    b2, c2, a2 = run(det_b[:, perm], det_s[:, perm], det_v[:, perm])
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # precondition: snapping actually moved boxes vs the no-snap run
    # (CLAUDE.md "Parity-test blind spots" — assert the variation)
    b0, _, a0 = track_batch(model, cfg, feats, anchor_ts, anchor_boxes, 0.3)
    live = np.asarray(a1) & np.asarray(a0)
    assert np.abs(np.asarray(b1) - np.asarray(b0))[live].max() > 0.5


def test_snap_residual_tie_targets_a_real_detection():
    """Residual ties (equal score AND equal IoU) must resolve to an ACTUAL
    detection via the lexicographic coordinate tie-break (ADVICE r4) — never
    a coordinate-wise hybrid of the tied boxes — and stay slot-permutation-
    invariant."""
    box = jnp.asarray([50.0, 50.0, 90.0, 90.0])
    # pure 4px translations of a SQUARE box ⇒ identical IoU with it. Case 1:
    # right-shift vs down-shift — the old coordinate-wise-max hybrid
    # [54,54,94,94] is NEITHER det; lexicographic x1 picks the right-shift.
    # Case 2: down vs up — x1 ties, the y1 key must decide (down-shift).
    cases = [
        ([4.0, 0.0, 4.0, 0.0], [0.0, 4.0, 0.0, 4.0]),
        ([0.0, 4.0, 0.0, 4.0], [0.0, -4.0, 0.0, -4.0]),
    ]
    for win_sh, lose_sh in cases:
        det_b = jnp.stack(
            [box + jnp.asarray(lose_sh), box + jnp.asarray(win_sh), box * 0.0]
        )
        det_s = jnp.asarray([0.8, 0.8, 0.9])
        det_v = jnp.asarray([True, True, False])
        snapped, any_c = snap_to_dets(box, det_b, det_s, det_v, 0.3, 1.0)
        assert bool(any_c)
        # snap_weight=1.0 ⇒ snapped IS the target, a real detection
        np.testing.assert_array_equal(
            np.asarray(snapped), np.asarray(box + jnp.asarray(win_sh))
        )
        perm_snapped, _ = snap_to_dets(
            box, det_b[::-1], det_s[::-1], det_v[::-1], 0.3, 1.0
        )
        np.testing.assert_array_equal(
            np.asarray(snapped), np.asarray(perm_snapped)
        )


def test_snap_pulls_toward_detections(setup):
    """With perfect GT detections available every frame, snapping must not
    hurt GT-following and must move boxes toward the detections."""
    sv, cfg, model, params, feats = setup
    K = sv.gt_boxes.shape[0]
    N = K
    det_b = np.swapaxes(sv.gt_boxes, 0, 1).astype(np.float32)  # (T, K, 4)
    det_s = np.full((T, N), 0.9, np.float32)
    det_v = np.ones((T, N), bool)
    anchor_t = jnp.asarray([T // 2] * K)
    anchor_boxes = jnp.asarray(sv.gt_boxes[:, T // 2])
    b0, _, a0 = track_batch(model, cfg, feats, anchor_t, anchor_boxes, 0.3)
    b1, _, a1 = track_batch(
        model, cfg, feats, anchor_t, anchor_boxes, 0.3,
        snap=(jnp.asarray(det_b), jnp.asarray(det_s), jnp.asarray(det_v)),
        snap_iou=0.4, snap_weight=0.5,
    )
    b0, a0, b1, a1 = (np.asarray(x) for x in (b0, a0, b1, a1))

    def mean_iou(boxes, alive):
        vals = [
            iou(boxes[k, t : t + 1], sv.gt_boxes[k, t : t + 1])[0, 0]
            for k in range(K)
            for t in range(T)
            if alive[k, t]
        ]
        return np.mean(vals)

    assert a1.sum() >= a0.sum() * 0.9  # snapping must not kill tracks
    assert mean_iou(b1, a1) >= mean_iou(b0, a0) - 1e-3


def test_folded_scan_matches_two_scan_form_with_snap(setup):
    """Fold-parity (same contract as the no-snap test) with snapping on."""
    import jax
    from vdetlib_tpu.nn.tracker_net import extract_template
    from vdetlib_tpu.video.track import _track_one_direction

    sv, cfg, model, params, feats = setup
    rng = np.random.default_rng(11)
    det_b, det_s, det_v = _snap_dets_from_gt(sv, rng)
    snap = (jnp.asarray(det_b), jnp.asarray(det_s), jnp.asarray(det_v))
    anchor_ts = jnp.asarray([2, T // 2, T - 2])
    anchor_boxes = jnp.asarray(
        [sv.gt_boxes[0, 2], sv.gt_boxes[1, T // 2], sv.gt_boxes[2, T - 2]]
    )
    kw = dict(snap_iou=0.4, snap_weight=0.5)

    def one(anchor_t, anchor_box):
        template = extract_template(feats[anchor_t], anchor_box, cfg)
        fb, fc, fa = _track_one_direction(
            feats, anchor_t, anchor_box, template, cfg, 0.3, reverse=False,
            snap=snap, **kw,
        )
        bb, bc, ba = _track_one_direction(
            feats, anchor_t, anchor_box, template, cfg, 0.3, reverse=True,
            snap=snap, **kw,
        )
        use_f = jnp.arange(T) >= anchor_t
        return (
            jnp.where(use_f[:, None], fb, bb),
            jnp.where(use_f, fc, bc),
            jnp.where(use_f, fa, ba),
        )

    ref_b, ref_c, ref_a = jax.vmap(one)(anchor_ts, anchor_boxes)
    got_b, got_c, got_a = track_batch(
        model, cfg, feats, anchor_ts, anchor_boxes, 0.3, snap=snap, **kw
    )
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), atol=0.05)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=5e-3)


def test_track_from_det_with_snap(setup):
    """End-to-end staged stage with snapping on: still well-formed tracks,
    and the tracks differ from the no-snap run (the knob is live)."""
    sv, cfg, model, params, _ = setup
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=2)
    base = dict(max_tracks=8, anchors_per_round=4, image_hw=HW)
    tp0 = track_from_det(
        model, params, vid, det, cfg, TrackOptions(**base), frames_u8=sv.frames
    )
    tp1 = track_from_det(
        model, params, vid, det, cfg,
        TrackOptions(snap_weight=0.5, snap_iou=0.4, **base),
        frames_u8=sv.frames,
    )
    assert 1 <= len(tp1["tracks"]) <= 8
    for track in tp1["tracks"]:
        frames = [b["frame"] for b in track]
        assert frames == sorted(frames)
        assert all(len(b["bbox"]) == 4 for b in track)
    flat0 = [tuple(np.round(b["bbox"], 3)) for tr in tp0["tracks"] for b in tr]
    flat1 = [tuple(np.round(b["bbox"], 3)) for tr in tp1["tracks"] for b in tr]
    assert flat0 != flat1  # precondition: snapping changed the output
