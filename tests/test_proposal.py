"""Proposal ingestion tests: .mat/.npz conversion, reuse window."""

import numpy as np
import pytest

from vdetlib_tpu.video.proposal import (
    load_proposals,
    load_proposals_mat,
    load_proposals_npz,
    reuse_across_frames,
)


def _write_mat_cells(path, per_frame):
    import scipy.io

    cells = np.empty((len(per_frame),), dtype=object)
    for i, arr in enumerate(per_frame):
        cells[i] = np.asarray(arr, dtype=np.float64)
    scipy.io.savemat(path, {"boxes": cells})


def test_mat_cell_array_selective_search_convention(tmp_path):
    # SS-style [y1 x1 y2 x2], 1-based
    per_frame = [
        [[11, 21, 31, 41]],  # → xyxy 0-based: [20, 10, 40, 30]
        [[1, 1, 5, 5], [2, 3, 6, 7]],
    ]
    path = str(tmp_path / "props.mat")
    _write_mat_cells(path, per_frame)
    proto = load_proposals_mat(path, "v1")
    assert proto["video"] == "v1"
    f1 = [b for b in proto["boxes"] if b["frame"] == 1]
    assert f1[0]["bbox"] == [20.0, 10.0, 40.0, 30.0]
    assert len([b for b in proto["boxes"] if b["frame"] == 2]) == 2


def test_mat_flat_array(tmp_path):
    import scipy.io

    arr = np.array([[1, 11, 21, 31, 41], [2, 1, 1, 9, 9]], dtype=np.float64)
    path = str(tmp_path / "flat.mat")
    scipy.io.savemat(path, {"boxes": arr})
    proto = load_proposals_mat(path, "v2")
    assert proto["boxes"][0]["frame"] == 1
    assert proto["boxes"][0]["bbox"] == [20.0, 10.0, 40.0, 30.0]


def test_npz_roundtrip(tmp_path):
    path = str(tmp_path / "p.npz")
    np.savez(path, frame_1=np.array([[0, 0, 10, 10]]), frame_3=np.array([[5, 5, 9, 9]]))
    proto = load_proposals_npz(path, "v3")
    assert [b["frame"] for b in proto["boxes"]] == [1, 3]


def test_load_dispatch_json(tmp_path):
    from vdetlib_tpu.protos import proto_dump

    bp = {"video": "v4", "boxes": [{"frame": 1, "bbox": [0, 0, 5, 5]}]}
    path = str(tmp_path / "b.json")
    proto_dump(bp, path)
    assert load_proposals(path, "v4") == bp
    with pytest.raises(ValueError):
        load_proposals(str(tmp_path / "x.txt"), "v")


def test_reuse_across_frames():
    bp = {
        "video": "v",
        "boxes": [
            {"frame": 1, "bbox": [0.0, 0.0, 5.0, 5.0]},
            {"frame": 2, "bbox": [10.0, 10.0, 20.0, 20.0]},
            {"frame": 3, "bbox": [1.0, 1.0, 2.0, 2.0]},
        ],
    }
    out = reuse_across_frames(bp, window=1)
    f2 = [b["bbox"] for b in out["boxes"] if b["frame"] == 2]
    assert len(f2) == 3  # own + both neighbors
    f1 = [b["bbox"] for b in out["boxes"] if b["frame"] == 1]
    assert len(f1) == 2  # own + frame 2's
    # no-op window
    assert reuse_across_frames(bp, 0) == bp
