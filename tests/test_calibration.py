"""Cross-video score calibration (evaluation/calibration.py).

The failure mode being fixed (RESULTS.md 100-video sweep): per-video score
scales differ, so pooled multi-video AP interleaves videos wrongly even when
every per-video ranking is correct. These tests build exactly that scenario
synthetically and assert calibration recovers the pooled mAP.
"""

import numpy as np
import pytest

from vdetlib_tpu.evaluation.calibration import (
    PlattCalibrator,
    calibrate_det_protos,
    rank_normalize,
)
from vdetlib_tpu.evaluation.vid_map import vid_map


def _make_video_protos(rng, video, n_frames=6, score_scale=1.0, n_obj=2):
    """One video's (det_proto, annot_proto): each frame has n_obj GT boxes;
    detections = good box (high score) + offset false positive (low score),
    all scores multiplied by score_scale (the per-video miscalibration)."""
    dets, anns = [], []
    tracks = [[] for _ in range(n_obj)]
    for t in range(1, n_frames + 1):
        for k in range(n_obj):
            x = 20 + 40 * k + 2 * t
            gt = [x, 30.0, x + 24, 60.0]
            tracks[k].append(
                {"frame": t, "bbox": gt, "class": "1", "class_index": 1}
            )
            good = float(np.clip(rng.uniform(0.7, 0.95) * score_scale, 0, 1))
            bad = float(np.clip(rng.uniform(0.3, 0.6) * score_scale, 0, 1))
            dets.append(
                {
                    "frame": t,
                    "bbox": [v + rng.uniform(-1, 1) for v in gt],
                    "scores": [{"class": "1", "class_index": 1, "score": good}],
                }
            )
            dets.append(
                {
                    "frame": t,
                    "bbox": [gt[0] + 30, gt[1] + 25, gt[2] + 30, gt[3] + 25],
                    "scores": [{"class": "1", "class_index": 1, "score": bad}],
                }
            )
    det_proto = {"video": video, "detections": dets}
    annot = {
        "video": video,
        "annotations": [{"id": k, "track": tr} for k, tr in enumerate(tracks)],
    }
    return det_proto, annot


@pytest.fixture
def miscalibrated_videos(rng):
    """8 videos whose score scales vary 0.15–1.0: per-video ranking perfect,
    pooled ranking broken (video A's false positives outscore video B's
    true positives)."""
    out = []
    for i in range(8):
        scale = 0.15 + 0.85 * (i / 7.0)
        out.append(_make_video_protos(rng, f"v{i:02d}", score_scale=scale))
    return out


def test_rank_normalize_preserves_within_video_order(rng):
    det, _ = _make_video_protos(rng, "v")
    cal = rank_normalize(det)
    orig = [s["score"] for d in det["detections"] for s in d["scores"]]
    new = [s["score"] for d in cal["detections"] for s in d["scores"]]
    assert np.array_equal(np.argsort(orig), np.argsort(new))
    assert max(new) <= 1.0 and min(new) >= 0.0


def test_rank_normalize_improves_pooled_map(rng, miscalibrated_videos):
    pairs = miscalibrated_videos
    raw_map, _ = vid_map(pairs)
    cal_dets = calibrate_det_protos([d for d, _ in pairs], method="rank")
    cal_map, _ = vid_map([(c, a) for c, (_, a) in zip(cal_dets, pairs)])
    assert raw_map < 0.9  # the scenario actually breaks pooled AP
    assert cal_map > raw_map + 0.05
    assert cal_map > 0.95  # per-video rankings were perfect


def test_platt_preserves_ap_and_improves_brier(rng):
    """A monotone per-class map cannot change per-class AP (and must not);
    its job is turning overconfident scores into TP probabilities — Brier
    score on held-out videos drops. (Per-VIDEO scale drift is rank
    normalization's job, not Platt's — a single monotone map can't touch
    it.)"""
    from vdetlib_tpu.evaluation.calibration import brier_score

    # same score scale everywhere, but systematically overconfident:
    # FPs score 0.3-0.6 while being always wrong → raw Brier is poor
    videos = [
        _make_video_protos(rng, f"u{i}", score_scale=1.0) for i in range(8)
    ]
    val, test = videos[:3], videos[3:]
    raw_map, _ = vid_map(test)
    cal = PlattCalibrator().fit(val)
    cal_pairs = [(cal.transform(d), a) for d, a in test]
    cal_map, _ = vid_map(cal_pairs)
    np.testing.assert_allclose(cal_map, raw_map, atol=1e-9)
    assert brier_score(cal_pairs) < brier_score(test) - 0.02
    a, _b = cal.global_params
    assert a >= 0  # monotone


def test_platt_roundtrip_serialization(rng, miscalibrated_videos):
    cal = PlattCalibrator().fit(miscalibrated_videos[:2])
    restored = PlattCalibrator.from_json(cal.to_json())
    det = miscalibrated_videos[2][0]
    s1 = [
        s["score"] for d in cal.transform(det)["detections"] for s in d["scores"]
    ]
    s2 = [
        s["score"]
        for d in restored.transform(det)["detections"]
        for s in d["scores"]
    ]
    np.testing.assert_allclose(s1, s2, rtol=1e-12)


def test_submission_writer_applies_platt(tmp_path, rng, miscalibrated_videos):
    """write_submission --calibration emits calibrated probabilities and
    --min_score filters on them (ROADMAP: Platt into the submission file)."""
    import json

    from vdetlib_tpu.cli.write_submission import main
    from vdetlib_tpu.protos import proto_dump

    cal = PlattCalibrator().fit(miscalibrated_videos[:4])
    cal_path = tmp_path / "cal.json"
    cal_path.write_text(json.dumps(cal.to_json()))

    det, _ = miscalibrated_videos[1]  # low score-scale video: FPs fall below 0.5
    frames = sorted({d["frame"] for d in det["detections"]})
    vid = {
        "video": det["video"],
        "root_path": str(tmp_path),
        "frames": [{"frame": f, "path": f"{f}.jpg"} for f in frames],
    }
    det_p, vid_p = tmp_path / "det.json", tmp_path / "vid.json"
    proto_dump(det, str(det_p))
    proto_dump(vid, str(vid_p))

    out_raw = tmp_path / "raw.txt"
    out_cal = tmp_path / "cal.txt"
    assert main([str(out_raw), "--pairs", str(vid_p), str(det_p)]) == 0
    assert main([
        str(out_cal), "--pairs", str(vid_p), str(det_p),
        "--calibration", str(cal_path), "--min_score", "0.5",
    ]) == 0
    raw_lines = out_raw.read_text().splitlines()
    cal_lines = out_cal.read_text().splitlines()
    # calibrated + thresholded: fewer lines, all scores ≥ 0.5, and they match
    # the calibrator's own transform
    assert 0 < len(cal_lines) < len(raw_lines)
    assert all(float(l.split()[2]) >= 0.5 for l in cal_lines)
    expect = sorted(
        round(float(s["score"]), 6)
        for d in cal.transform(det)["detections"]
        for s in d["scores"]
        if float(s["score"]) >= 0.5
    )
    got = sorted(float(l.split()[2]) for l in cal_lines)
    np.testing.assert_allclose(got, expect, atol=1e-6)
