"""Tubelet rescoring: device kernel vs oracle, stage end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from tests.oracle.rescore import rescore as oracle_rescore
from vdetlib_tpu.data.synth import (
    SynthConfig,
    det_proto_from_gt,
    make_video,
    vid_proto_in_memory,
)
from vdetlib_tpu.protos.arrays import arrays_to_track_proto
from vdetlib_tpu.video.rescore import RescoreOptions, rescore_arrays, tubelet_rescore


def _problem(rng, T=6, N=8, K=3, C=4):
    det_boxes = np.stack([random_boxes(rng, N) for _ in range(T)])
    det_scores = rng.uniform(0, 1, size=(T, N, C)).astype(np.float32)
    det_mask = rng.uniform(size=(T, N)) > 0.2
    # tracks follow some detections with jitter so matches exist
    trk_boxes = np.zeros((K, T, 4), np.float32)
    for k in range(K):
        for t in range(T):
            trk_boxes[k, t] = det_boxes[t, k % N] + rng.normal(0, 1, 4)
    trk_mask = rng.uniform(size=(K, T)) > 0.2
    det_scores *= det_mask[..., None]
    return det_boxes, det_scores, det_mask, trk_boxes, trk_mask


@pytest.mark.parametrize(
    "seed,boost,gate", [(0, "max", 0.0), (1, "max", 0.5), (2, "mean", 0.3)]
)
def test_matches_oracle(seed, boost, gate):
    rng = np.random.default_rng(seed)
    db, ds, dm, tb, tm = _problem(rng)
    want_scores, want_stats = oracle_rescore(
        db, ds, dm, tb, tm, match_thresh=0.5, bg_decay=0.7, boost=boost,
        min_matched_frac=gate,
    )
    got_scores, got_stats, _ = rescore_arrays(
        jnp.asarray(db), jnp.asarray(ds), jnp.asarray(dm),
        jnp.asarray(tb), jnp.asarray(tm), 0.5, 0.7, boost=boost,
        min_matched_frac=gate,
    )
    np.testing.assert_allclose(np.asarray(got_scores), want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stats), want_stats, rtol=1e-4, atol=1e-5)


def test_min_matched_frac_gates_flicker_tracks():
    """A track IoU-matched on too few of its live frames contributes no
    statistic: no boost for its dets (they keep RAW scores — bg_decay must
    not hit them either, they are still on-track) while a well-matched
    track is unaffected."""
    T, N, C, K = 6, 2, 3, 2
    A = np.array([10.0, 10.0, 30.0, 30.0], np.float32)
    B = np.array([100.0, 100.0, 130.0, 130.0], np.float32)
    det_boxes = np.zeros((T, N, 4), np.float32)
    det_boxes[:, 0] = A
    det_boxes[:, 1] = B
    det_scores = np.zeros((T, N, C), np.float32)
    det_scores[:, 0, 1] = 0.9  # good-track det, every frame
    det_mask = np.zeros((T, N), bool)
    det_mask[:, 0] = True
    # flicker-track dets exist on only 2 of 6 frames (matched_frac = 1/3)
    det_mask[2, 1] = det_mask[3, 1] = True
    det_scores[2, 1, 2] = 0.9
    det_scores[3, 1, 2] = 0.2
    trk_boxes = np.zeros((K, T, 4), np.float32)
    trk_boxes[0, :] = A
    trk_boxes[1, :] = B
    trk_mask = np.ones((K, T), bool)

    def run(gate):
        s, st, _ = rescore_arrays(
            jnp.asarray(det_boxes), jnp.asarray(det_scores),
            jnp.asarray(det_mask), jnp.asarray(trk_boxes),
            jnp.asarray(trk_mask), 0.5, 0.5, top_ratio=0.5, boost="max",
            min_matched_frac=gate,
        )
        return np.asarray(s), np.asarray(st)

    open_scores, open_stats = run(0.0)
    gated_scores, gated_stats = run(0.5)
    # gate off: flicker track's stat (top-3 mean of .9/.2/0) boosts its
    # weak det
    assert open_stats[1, 2] == pytest.approx((0.9 + 0.2) / 3)
    assert open_scores[3, 1, 2] == pytest.approx(open_stats[1, 2])
    # gate on (1/3 < 0.5): stat zeroed, det keeps RAW 0.2 — neither boosted
    # nor bg-decayed (bg_decay=0.5 would give 0.1)
    assert gated_stats[1].max() == 0.0
    assert gated_scores[3, 1, 2] == pytest.approx(0.2)
    # the fully-matched track is untouched by the gate
    np.testing.assert_allclose(gated_stats[0], open_stats[0])
    np.testing.assert_allclose(gated_scores[:, 0], open_scores[:, 0])


def test_min_matched_frac_suppresses_injection():
    """tubelet_boxes injection from a distrusted track is suppressed: its
    interior-gap boxes do not enter the det set."""
    sv = make_video(SynthConfig(num_frames=10, seed=9, num_objects=1))
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=0)
    # dets only on the first and last frames → matched_frac = 0.2
    keep_frames = {sv.frame_ids[0], sv.frame_ids[-1]}
    det["detections"] = [
        d for d in det["detections"] if d["frame"] in keep_frames
    ]
    K, T = sv.gt_boxes.shape[:2]
    trk = arrays_to_track_proto(
        sv.gt_boxes, np.ones((K, T), np.float32), np.ones((K, T), bool),
        sv.frame_ids, sv.video, "gt",
    )
    C = sv.config.num_classes
    open_opts = RescoreOptions(num_classes=C, max_boxes=32, tubelet_boxes=True)
    _, open_det = tubelet_rescore(vid, det, trk, open_opts)
    gated_opts = RescoreOptions(
        num_classes=C, max_boxes=32, tubelet_boxes=True, min_matched_frac=0.5
    )
    _, gated_det = tubelet_rescore(vid, det, trk, gated_opts)
    interior = set(sv.frame_ids) - keep_frames
    assert any(d["frame"] in interior for d in open_det["detections"])
    assert not any(d["frame"] in interior for d in gated_det["detections"])


def test_boost_monotone():
    """Rescoring with boost=max never lowers an on-track det score."""
    rng = np.random.default_rng(3)
    db, ds, dm, tb, tm = _problem(rng)
    got_scores, _, _ = rescore_arrays(
        jnp.asarray(db), jnp.asarray(ds), jnp.asarray(dm),
        jnp.asarray(tb), jnp.asarray(tm), 0.5, 1.0, boost="max",
    )
    got = np.asarray(got_scores)
    assert (got + 1e-6 >= ds * dm[..., None]).all()


def test_tubelet_boxes_fill_detection_gaps():
    """tubelet_boxes=True injects live unmatched track boxes as detections
    scored by the tubelet statistic (T-CNN tubelet-box semantics)."""
    sv = make_video(SynthConfig(num_frames=10, seed=9, num_objects=1))
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=0)
    gap_frames = {4, 5, 6}
    det["detections"] = [
        d for d in det["detections"] if d["frame"] not in gap_frames
    ]
    K, T = sv.gt_boxes.shape[:2]
    trk = arrays_to_track_proto(
        sv.gt_boxes, np.ones((K, T), np.float32), np.ones((K, T), bool),
        sv.frame_ids, sv.video, "gt",
    )
    C = sv.config.num_classes
    base = RescoreOptions(num_classes=C, max_boxes=32)
    _, plain = tubelet_rescore(vid, det, trk, base)
    _, filled = tubelet_rescore(
        vid, det, trk,
        RescoreOptions(num_classes=C, max_boxes=32, tubelet_boxes=True),
    )
    assert not any(d["frame"] in gap_frames for d in plain["detections"])
    injected = [d for d in filled["detections"] if d["frame"] in gap_frames]
    assert len(injected) == len(gap_frames) * K
    cls = int(sv.gt_classes[0])
    for d in injected:
        t = sv.frame_ids.index(d["frame"])
        np.testing.assert_allclose(d["bbox"], sv.gt_boxes[0, t], atol=1e-4)
        by_c = {s["class_index"]: s["score"] for s in d["scores"]}
        assert by_c.get(cls, 0.0) > 0.5  # the tubelet statistic
    # matched frames are NOT duplicated
    for f in set(sv.frame_ids) - gap_frames:
        n_plain = sum(d["frame"] == f for d in plain["detections"])
        n_filled = sum(d["frame"] == f for d in filled["detections"])
        assert n_plain == n_filled, f


def test_stage_end_to_end():
    sv = make_video(SynthConfig(num_frames=8, seed=7))
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=2)
    K, T = sv.gt_boxes.shape[:2]
    # perfect tracks = the GT tubelets
    trk = arrays_to_track_proto(
        sv.gt_boxes,
        np.ones((K, T), np.float32),
        np.ones((K, T), bool),
        sv.frame_ids,
        sv.video,
        "gt",
    )
    opts = RescoreOptions(num_classes=sv.config.num_classes, max_boxes=32)
    score_proto, det_out = tubelet_rescore(vid, det, trk, opts)
    assert len(score_proto["tracks"]) == K
    # each GT track's class statistic should be high for its true class
    for k in range(K):
        cls = int(sv.gt_classes[k])
        entry = {s["class_index"]: s["score"] for s in score_proto["tracks"][k]["scores"]}
        assert entry.get(cls, 0.0) > 0.5, (k, entry)
    # rescored det proto retains all frames
    assert {d["frame"] for d in det_out["detections"]} == set(sv.frame_ids)


@pytest.mark.parametrize("seed,floor", [(4, 3), (5, 8)])
def test_stat_floor_matches_oracle(seed, floor):
    rng = np.random.default_rng(seed)
    db, ds, dm, tb, tm = _problem(rng)
    want_scores, want_stats = oracle_rescore(
        db, ds, dm, tb, tm, match_thresh=0.5, bg_decay=0.7, boost="mean",
        stat_floor=floor,
    )
    got_scores, got_stats, _ = rescore_arrays(
        jnp.asarray(db), jnp.asarray(ds), jnp.asarray(dm),
        jnp.asarray(tb), jnp.asarray(tm), 0.5, 0.7, boost="mean",
        stat_floor=float(floor),
    )
    np.testing.assert_allclose(np.asarray(got_scores), want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stats), want_stats, rtol=1e-4, atol=1e-5)
    # precondition (CLAUDE.md blind-spot lesson): the floor actually bound —
    # at least one track's top-k count is below it
    live = tm.sum(axis=1)
    assert (np.ceil(live * 0.5) < floor).any()


def test_stat_floor_damps_short_flicker_tracks():
    """The distractor signature the floor targets: a SHORT track with high
    matched scores currently gets a small top-k denominator and a HIGHER
    statistic than a long real track with occasional dips. The floor damps
    the short track proportionally and leaves the long track untouched."""
    T, N, C, K = 30, 2, 3, 2
    A = np.array([10.0, 10.0, 30.0, 30.0], np.float32)
    B = np.array([100.0, 100.0, 130.0, 130.0], np.float32)
    det_boxes = np.zeros((T, N, 4), np.float32)
    det_boxes[:, 0] = A
    det_boxes[:, 1] = B
    det_scores = np.zeros((T, N, C), np.float32)
    det_mask = np.zeros((T, N), bool)
    # long real track: matched every frame at ~0.7 with dips
    det_mask[:, 0] = True
    det_scores[:, 0, 1] = 0.7
    det_scores[::5, 0, 1] = 0.4  # occasional dips
    # short flicker track: live 4 frames, matched on 3 at 0.9
    det_mask[10:13, 1] = True
    det_scores[10:13, 1, 2] = 0.9
    trk_boxes = np.zeros((K, T, 4), np.float32)
    trk_boxes[0, :] = A
    trk_boxes[1, :] = B
    trk_mask = np.zeros((K, T), bool)
    trk_mask[0, :] = True
    trk_mask[1, 10:14] = True  # live length 4 → k = 2

    def run(floor):
        _, st, _ = rescore_arrays(
            jnp.asarray(det_boxes), jnp.asarray(det_scores),
            jnp.asarray(det_mask), jnp.asarray(trk_boxes),
            jnp.asarray(trk_mask), 0.5, 1.0, top_ratio=0.5, boost="max",
            stat_floor=float(floor),
        )
        return np.asarray(st)

    st0 = run(0)
    # precondition: WITHOUT the floor the flicker track outscores the real
    # track — the failure mode being fixed must actually be present
    assert st0[1, 2] > st0[0, 1]
    assert st0[1, 2] == pytest.approx(0.9)  # top-2 mean of (.9, .9)
    st8 = run(8)
    # floored: flicker stat scaled by k/floor = 2/8; real track has k=15>8
    assert st8[1, 2] == pytest.approx(0.9 * 2 / 8)
    np.testing.assert_allclose(st8[0], st0[0])
    assert st8[1, 2] < st8[0, 1]
