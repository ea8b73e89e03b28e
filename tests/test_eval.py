"""VID mAP + submission writer tests."""

import numpy as np

from vdetlib_tpu.data.synth import SynthConfig, annot_proto, det_proto_from_gt, make_video, vid_proto_in_memory
from vdetlib_tpu.evaluation.submission import submission_lines, write_submission
from vdetlib_tpu.evaluation.vid_map import vid_map


def _perfect_det(sv):
    """det_proto exactly equal to GT with score 1.0."""
    dets = []
    for k in range(sv.gt_boxes.shape[0]):
        ci = int(sv.gt_classes[k])
        for t, fid in enumerate(sv.frame_ids):
            dets.append(
                {
                    "frame": fid,
                    "bbox": [float(v) for v in sv.gt_boxes[k, t]],
                    "scores": [{"class": str(ci), "class_index": ci, "score": 1.0}],
                }
            )
    return {"video": sv.video, "detections": dets}


def test_perfect_detections_map_1():
    sv = make_video(SynthConfig(num_frames=6, seed=11))
    m, aps = vid_map([(_perfect_det(sv), annot_proto(sv))])
    assert m == 1.0
    assert all(v == 1.0 for v in aps.values())


def test_noisy_detections_below_perfect_above_garbage():
    sv = make_video(SynthConfig(num_frames=8, seed=12))
    noisy = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=4)
    m_noisy, _ = vid_map([(noisy, annot_proto(sv))])
    # garbage: random boxes only
    rng = np.random.default_rng(0)
    garbage = {
        "video": sv.video,
        "detections": [
            {
                "frame": fid,
                "bbox": [1.0, 1.0, 10.0, 10.0],
                "scores": [{"class": "1", "class_index": 1, "score": 0.9}],
            }
            for fid in sv.frame_ids
        ],
    }
    m_garbage, _ = vid_map([(garbage, annot_proto(sv))])
    assert 0.3 < m_noisy <= 1.0
    assert m_garbage < 0.1


def test_duplicates_are_fps():
    """Duplicates interleaved in score order count as FPs → AP drops.

    (Trailing FPs after full recall do NOT lower all-points AP — that part is
    VOC semantics, asserted via m_single == 1.0 with appended duplicates.)
    """
    sv = make_video(SynthConfig(num_frames=4, seed=13, num_objects=1))
    det = _perfect_det(sv)
    # descending TP scores 0.9, 0.8, ... with duplicates interleaved between
    for i, d in enumerate(det["detections"]):
        d["scores"][0]["score"] = 0.9 - 0.1 * i
    dups = []
    for i, d in enumerate(det["detections"]):
        dd = {**d, "scores": [dict(d["scores"][0])]}
        dd["scores"][0]["score"] = 0.85 - 0.1 * i
        dups.append(dd)
    dup = {"video": sv.video, "detections": det["detections"] + dups}
    m_single, _ = vid_map([(det, annot_proto(sv))])
    m_dup, _ = vid_map([(dup, annot_proto(sv))])
    assert m_single == 1.0
    assert m_dup < 1.0


def test_submission_lines_and_writer(tmp_path):
    sv = make_video(SynthConfig(num_frames=3, seed=14, num_objects=1))
    det = _perfect_det(sv)
    vid = vid_proto_in_memory(sv)
    lines = submission_lines(det)
    assert len(lines) == len(det["detections"])
    parts = lines[0].split()
    assert len(parts) == 7
    int(parts[0]); int(parts[1]); [float(p) for p in parts[2:]]
    # two videos → second video's frames offset by len(video 1)
    path = str(tmp_path / "sub.txt")
    n = write_submission([det, det], [vid, vid], path)
    assert n == 2 * len(lines)
    all_lines = open(path).read().splitlines()
    assert int(all_lines[len(lines)].split()[0]) == 1 + len(vid["frames"])


def test_gen_synth_cli_scale_rate(tmp_path):
    """gen_synth --scale_rate produces growing GT boxes (zooming objects)."""
    import numpy as np

    from vdetlib_tpu.cli.gen_synth import main
    from vdetlib_tpu.protos import proto_load

    out = tmp_path / "ds"
    rc = main([
        str(out), "--num_videos", "1", "--frames", "10", "--height", "96",
        "--width", "128", "--proposals", "8", "--scale_rate", "0.05",
    ])
    assert rc == 0
    annot = proto_load(str(out / "synth000.annot.json"))
    grew = 0
    for a in annot["annotations"]:
        tr = a["track"]
        first, last = tr[0]["bbox"], tr[-1]["bbox"]
        area = lambda b: max(b[2] - b[0], 1) * max(b[3] - b[1], 1)
        if area(last) > area(first) * 1.3:
            grew += 1
    assert grew >= 1, "no object grew despite scale_rate"
