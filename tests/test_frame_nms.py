"""Config 1 end-to-end: vid_proto + det_proto → per-frame NMS → det_proto.

Host and XLA backends must agree exactly on the surviving (det, class) set.
"""

import numpy as np
import pytest

from tests.oracle.nms import nms as oracle_nms
from vdetlib_tpu.data.synth import SynthConfig, det_proto_from_gt, make_video, vid_proto_in_memory
from vdetlib_tpu.protos import proto_dump, proto_load
from vdetlib_tpu.video.frame_nms import frame_nms


@pytest.fixture(scope="module")
def sv():
    return make_video(SynthConfig(num_frames=30, seed=0))


@pytest.fixture(scope="module")
def protos(sv):
    return vid_proto_in_memory(sv), det_proto_from_gt(sv)


def _det_key_set(det_proto):
    out = set()
    for d in det_proto["detections"]:
        for s in d["scores"]:
            out.add(
                (d["frame"], tuple(round(v, 4) for v in d["bbox"]), s["class_index"])
            )
    return out


def test_host_backend_matches_manual_oracle(protos):
    vid, det = protos
    got = frame_nms(vid, det, thresh=0.3, backend="host")
    # Manual oracle: group by (frame, class), run oracle nms.
    want = set()
    by_fc = {}
    for i, d in enumerate(det["detections"]):
        for s in d["scores"]:
            by_fc.setdefault((d["frame"], s["class_index"]), []).append(
                (i, list(d["bbox"]) + [s["score"]])
            )
    for (f, c), rows in by_fc.items():
        keep = oracle_nms(np.array([r for _, r in rows], np.float32), 0.3)
        for k in keep:
            i, row = rows[k]
            want.add((f, tuple(round(v, 4) for v in row[:4]), c))
    assert _det_key_set(got) == want


def test_xla_backend_matches_host(protos):
    vid, det = protos
    host = frame_nms(vid, det, thresh=0.3, backend="host")
    xla = frame_nms(vid, det, thresh=0.3, backend="xla", max_boxes=64)
    assert _det_key_set(host) == _det_key_set(xla)


def test_nms_reduces_and_is_idempotent(protos):
    vid, det = protos
    once = frame_nms(vid, det, thresh=0.3, backend="host")
    assert len(once["detections"]) < len(det["detections"])
    twice = frame_nms(vid, once, thresh=0.3, backend="host")
    assert _det_key_set(twice) == _det_key_set(once)


def test_config1_json_roundtrip(tmp_path, protos):
    """The full config-1 path: JSON in → NMS → JSON out, pure CPU."""
    vid, det = protos
    vid_path, det_path, out_path = (
        str(tmp_path / "vid.json"),
        str(tmp_path / "det.json"),
        str(tmp_path / "out.json"),
    )
    proto_dump(vid, vid_path)
    proto_dump(det, det_path)
    result = frame_nms(proto_load(vid_path), proto_load(det_path), thresh=0.3)
    proto_dump(result, out_path)
    reloaded = proto_load(out_path)
    assert reloaded["video"] == "synth"
    assert _det_key_set(reloaded) == _det_key_set(result)
