"""Visualization tests (VERDICT r1 missing #5 — SURVEY.md §4 layer 2).

The reference's de-facto verification layer was visual inspection; these
tests make the drawing surface itself testable: boxes must visibly change
pixels at their borders, every frame must be written, and the show_det /
show_track CLI tools must run end-to-end.
"""

import os

import numpy as np
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video, write_frames
from vdetlib_tpu.utils.common import imread
from vdetlib_tpu.utils.visual import (
    draw_detections_on_frame,
    show_detections,
    show_tracks,
    unique_color,
)

T, HW = 4, (96, 128)


@pytest.fixture(scope="module")
def disk_video(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vis")
    sv = make_video(
        SynthConfig(num_frames=T, height=HW[0], width=HW[1], seed=3), video="visvid"
    )
    vid_proto = write_frames(sv, str(tmp))
    return sv, vid_proto, tmp


def _border_pixels(img, bbox):
    x1, y1, x2, y2 = [int(round(v)) for v in bbox]
    return np.concatenate(
        [img[y1, x1:x2].ravel(), img[y2, x1:x2].ravel(),
         img[y1:y2, x1].ravel(), img[y1:y2, x2].ravel()]
    )


def test_draw_changes_pixels_inside_box():
    img = np.zeros((HW[0], HW[1], 3), np.uint8)
    bbox = [20.0, 20.0, 80.0, 60.0]
    dets = [{"frame": 1, "bbox": bbox,
             "scores": [{"class": "2", "class_index": 2, "score": 0.9}]}]
    out = draw_detections_on_frame(img.copy(), dets)
    assert _border_pixels(out, bbox).sum() > 0  # border drawn
    # a far-away region stays untouched
    assert (out[85:, 100:] == 0).all()


def test_unique_colors_distinct():
    colors = {unique_color(i) for i in range(16)}
    assert len(colors) == 16


def test_show_detections_writes_all_frames(disk_video):
    sv, vid_proto, tmp = disk_video
    bbox = [10.0, 10.0, 50.0, 50.0]
    det_proto = {
        "video": sv.video,
        "detections": [
            {"frame": int(f), "bbox": bbox,
             "scores": [{"class": "1", "class_index": 1, "score": 0.8}]}
            for f in sv.frame_ids
        ],
    }
    out_dir = str(tmp / "det_out")
    written = show_detections(vid_proto, det_proto, out_dir, score_thresh=0.1)
    assert len(written) == T
    for path, fr in zip(written, vid_proto["frames"]):
        assert os.path.exists(path)
        orig = imread(os.path.join(vid_proto["root_path"], fr["path"]))
        drawn = imread(path)
        # drawing modified the border, not the far corner
        assert (
            _border_pixels(drawn, bbox) != _border_pixels(orig, bbox)
        ).any()


def test_show_tracks_writes_all_frames(disk_video):
    sv, vid_proto, tmp = disk_video
    track = [
        {"frame": int(f), "bbox": [30.0, 30.0, 70.0, 70.0], "score": 0.5}
        for f in sv.frame_ids
    ]
    track_proto = {"video": sv.video, "method": "m", "tracks": [track]}
    out_dir = str(tmp / "trk_out")
    written = show_tracks(vid_proto, track_proto, out_dir)
    assert len(written) == T
    drawn = imread(written[0])
    assert _border_pixels(drawn, track[0]["bbox"]).size > 0


def test_show_cli_roundtrip(disk_video):
    from vdetlib_tpu.cli.show import main as show_main
    from vdetlib_tpu.protos import proto_dump

    sv, vid_proto, tmp = disk_video
    det_proto = {
        "video": sv.video,
        "detections": [
            {"frame": int(sv.frame_ids[0]), "bbox": [5.0, 5.0, 40.0, 40.0],
             "scores": [{"class": "1", "class_index": 1, "score": 0.9}]}
        ],
    }
    vid_f = str(tmp / "vid.json")
    det_f = str(tmp / "det.json")
    proto_dump(vid_proto, vid_f)
    proto_dump(det_proto, det_f)
    out_dir = str(tmp / "cli_out")
    assert show_main([vid_f, det_f, out_dir]) == 0
    assert len(os.listdir(out_dir)) == T
