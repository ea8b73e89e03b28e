"""Wire-contract tests: codec round-trips, accessors, array bridges."""

import os

import numpy as np
import pytest

from vdetlib_tpu.data.synth import (
    SynthConfig,
    annot_proto,
    box_proto,
    det_proto_from_gt,
    make_video,
    vid_proto_in_memory,
)
from vdetlib_tpu.protos import (
    arrays_to_det_proto,
    arrays_to_track_proto,
    box_proto_to_arrays,
    boxes_at_frame,
    det_proto_to_arrays,
    dets_at_frame,
    empty_det_from_box,
    frame_ids,
    frame_path_after,
    frame_path_at,
    frame_path_before,
    proto_dump,
    proto_load,
    top_detections,
    track_box_at_frame,
    track_proto_to_arrays,
    tracks_at_frame,
    tracks_proto_from_boxes,
)


@pytest.fixture(scope="module")
def sv():
    return make_video(SynthConfig(num_frames=10, seed=3))


def test_proto_roundtrip_json(tmp_path, sv):
    vid = vid_proto_in_memory(sv)
    path = str(tmp_path / "vid.json")
    proto_dump(vid, path)
    assert proto_load(path) == vid


def test_proto_roundtrip_gzip(tmp_path, sv):
    det = det_proto_from_gt(sv)
    path = str(tmp_path / "det.json.gz")
    proto_dump(det, path)
    loaded = proto_load(path)
    assert loaded["video"] == det["video"]
    assert loaded["detections"] == det["detections"]


def test_proto_dump_serializes_numpy(tmp_path):
    proto = {"video": "v", "x": np.float32(1.5), "arr": np.arange(3)}
    path = str(tmp_path / "p.json")
    proto_dump(proto, path)
    loaded = proto_load(path)
    assert loaded["x"] == 1.5
    assert loaded["arr"] == [0, 1, 2]


def test_frame_paths(sv):
    vid = vid_proto_in_memory(sv)
    vid["root_path"] = "/data"
    assert frame_path_at(vid, 1).endswith("000001.jpg")
    assert frame_path_at(vid, 1).startswith("/data")
    assert frame_path_before(vid, 5) == frame_path_at(vid, 5)
    assert frame_path_after(vid, 5) == frame_path_at(vid, 5)
    # missing frame 0 → closest after is 1
    assert frame_path_after(vid, 0) == frame_path_at(vid, 1)
    with pytest.raises(KeyError):
        frame_path_at(vid, 99)
    with pytest.raises(KeyError):
        frame_path_before(vid, 0)


def test_boxes_and_dets_at_frame(sv):
    bp = box_proto(sv)
    dp = det_proto_from_gt(sv)
    assert len(boxes_at_frame(bp, 1)) > 0
    assert all(len(b) == 4 for b in boxes_at_frame(bp, 1))
    dets = dets_at_frame(dp, 1)
    assert all(d["frame"] == 1 for d in dets)


def test_empty_det_and_top_detections(sv):
    d = empty_det_from_box([1, 2, 3, 4], 7)
    assert d == {"frame": 7, "bbox": [1.0, 2.0, 3.0, 4.0], "scores": []}
    dp = det_proto_from_gt(sv)
    top = top_detections(dp, 5)
    scores = [max(s["score"] for s in d["scores"]) for d in top]
    assert scores == sorted(scores, reverse=True)


def test_tracks_proto_roundtrip(sv):
    fids = sv.frame_ids
    per_track = [
        [(f, [10 + f, 20, 50 + f, 60], 0.9) for f in fids[:5]],
        [(f, [100, 100 + f, 150, 150 + f], 0.8) for f in fids[2:8]],
    ]
    tp = tracks_proto_from_boxes(per_track, "synth", anchors=[1, 3])
    assert len(tp["tracks"]) == 2
    assert track_box_at_frame(tp["tracks"][0], 3) == [13.0, 20.0, 53.0, 60.0]
    assert track_box_at_frame(tp["tracks"][0], 9) is None
    assert len(tracks_at_frame(tp, 3)) == 2
    assert len(tracks_at_frame(tp, 1)) == 1

    boxes, scores, mask = track_proto_to_arrays(tp, fids)
    assert boxes.shape == (2, len(fids), 4)
    assert mask[0, :5].all() and not mask[0, 5:].any()
    rt = arrays_to_track_proto(boxes, scores, mask, fids, "synth", "m")
    assert rt["tracks"][0][0]["bbox"] == tp["tracks"][0][0]["bbox"]


def test_det_array_bridge_roundtrip(sv):
    dp = det_proto_from_gt(sv)
    fids = sv.frame_ids
    C = sv.config.num_classes
    boxes, scores, mask = det_proto_to_arrays(dp, fids, max_boxes=64, num_classes=C)
    assert boxes.shape == (len(fids), 64, 4)
    # score_thresh=0.0 drops the all-zero padding entries (the bridge cannot
    # distinguish an absent class from an explicit 0.0 score).
    rt = arrays_to_det_proto(boxes, scores, mask, fids, "synth", score_thresh=0.0)
    # Round trip preserves every (frame, bbox, class, score) tuple.
    def key(d):
        # coordinates pass through float32 arrays: compare at 2 decimals
        return (
            d["frame"],
            tuple(round(v, 2) for v in d["bbox"]),
            tuple(sorted((s["class_index"], round(s["score"], 4)) for s in d["scores"])),
        )

    assert sorted(map(key, rt["detections"])) == sorted(map(key, dp["detections"]))


def test_annot_proto_shape(sv):
    ap = annot_proto(sv)
    assert len(ap["annotations"]) == sv.config.num_objects
    tr = ap["annotations"][0]["track"]
    assert [b["frame"] for b in tr] == sv.frame_ids
