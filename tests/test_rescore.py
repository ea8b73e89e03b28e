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


@pytest.mark.parametrize("seed,boost", [(0, "max"), (1, "max"), (2, "mean")])
def test_matches_oracle(seed, boost):
    rng = np.random.default_rng(seed)
    db, ds, dm, tb, tm = _problem(rng)
    want_scores, want_stats = oracle_rescore(
        db, ds, dm, tb, tm, match_thresh=0.5, bg_decay=0.7, boost=boost
    )
    got_scores, got_stats, _ = rescore_arrays(
        jnp.asarray(db), jnp.asarray(ds), jnp.asarray(dm),
        jnp.asarray(tb), jnp.asarray(tm), 0.5, 0.7, boost=boost,
    )
    np.testing.assert_allclose(np.asarray(got_scores), want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stats), want_stats, rtol=1e-4, atol=1e-5)


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
