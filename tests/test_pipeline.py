"""Full-pipeline tests (config 5): staged run, resume, mAP sanity."""

import os

import numpy as np
import pytest

from vdetlib_tpu.data.synth import (
    SynthConfig,
    annot_proto,
    box_proto,
    make_video,
    write_frames,
)
from vdetlib_tpu.evaluation.vid_map import vid_map
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.pipeline.runner import Models, PipelineConfig, run_video, run_videos
from vdetlib_tpu.protos import proto_dump, proto_load
from vdetlib_tpu.video.detect import DetectOptions
from vdetlib_tpu.video.link import LinkOptions
from vdetlib_tpu.video.mgp import MGPOptions
from vdetlib_tpu.video.rescore import RescoreOptions
from vdetlib_tpu.video.track import TrackOptions, init_tracker

HW = (96, 128)
R = 16
C = 4


@pytest.fixture(scope="module")
def models():
    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    return Models(det_model, det_params, trk_model, trk_params), trk_cfg


@pytest.fixture(scope="module")
def cfg(models):
    _, trk_cfg = models
    return PipelineConfig(
        detect=DetectOptions(batch_size=4, max_rois=R, image_hw=HW, score_thresh=0.05),
        mgp=MGPOptions(window=1, num_classes=C, max_boxes=32, image_hw=HW),
        track=TrackOptions(max_tracks=6, anchors_per_round=3, image_hw=HW),
        tracker_cfg=trk_cfg,
        rescore=RescoreOptions(num_classes=C, max_boxes=64),
        link=LinkOptions(num_classes=C, max_boxes=64, max_paths=40),
    )


def _dataset(tmp_path, n=2, frames=8):
    vids = []
    for i in range(n):
        sv = make_video(
            SynthConfig(
                num_frames=frames, height=HW[0], width=HW[1], num_classes=C,
                proposals_per_frame=R, seed=20 + i,
            ),
            video=f"pv{i}",
        )
        vid = write_frames(sv, str(tmp_path / "frames"))
        vids.append((sv, vid))
    return vids


def test_run_video_all_stages(tmp_path, models, cfg):
    (sv, vid), = _dataset(tmp_path, n=1)
    m, _ = models
    paths = run_video(str(tmp_path / "work"), vid, box_proto(sv), m, cfg)
    for stage in ("detect", "mgp", "track", "rescored", "final", "tubelets"):
        assert os.path.exists(paths[stage]), stage
    final = proto_load(paths["final"])
    assert final["video"] == sv.video
    assert len(final["detections"]) > 0
    tracks = proto_load(paths["track"])
    assert len(tracks["tracks"]) >= 1


def test_resume_by_existence(tmp_path, models, cfg):
    (sv, vid), = _dataset(tmp_path, n=1)
    m, _ = models
    work = str(tmp_path / "work")
    paths = run_video(work, vid, box_proto(sv), m, cfg)
    mtime = os.path.getmtime(paths["final"])
    # second run must not rewrite anything
    paths2 = run_video(work, vid, box_proto(sv), m, cfg)
    assert os.path.getmtime(paths2["final"]) == mtime


def test_pipeline_map_reasonable(tmp_path, models, cfg):
    """With GT-quality dets injected, the pipeline output scores high mAP."""
    from vdetlib_tpu.data.synth import det_proto_from_gt

    (sv, vid), = _dataset(tmp_path, n=1, frames=10)
    m, _ = models
    det = det_proto_from_gt(sv, dets_per_object=2, distractors_per_frame=2)
    paths = run_video(
        str(tmp_path / "work"), vid, None, m, cfg, det_proto=det
    )
    final = proto_load(paths["final"])
    mp, aps = vid_map([(final, annot_proto(sv))])
    assert mp > 0.4, (mp, aps)


def test_perturb_stage(tmp_path, models, cfg):
    """Optional perturb stage runs between track and rescore."""
    from dataclasses import replace
    from vdetlib_tpu.video.perturb import PerturbOptions

    (sv, vid), = _dataset(tmp_path, n=1)
    m, _ = models
    pcfg = replace(
        cfg,
        perturb=PerturbOptions(num_perturb=3),
        stages=("detect", "mgp", "track", "perturb", "rescore", "seq_nms"),
    )
    paths = run_video(str(tmp_path / "workp"), vid, box_proto(sv), m, pcfg)
    assert os.path.exists(paths["perturbed"])
    tp = proto_load(paths["perturbed"])
    assert any(
        "perturb_scores" in b for track in tp["tracks"] for b in
        (track["boxes"] if isinstance(track, dict) else track)
    )
    assert os.path.exists(paths["final"])


def test_cli_track_scales_flag(tmp_path):
    """pipeline_tool --track_scales N reaches TrackerConfig (scale-adaptive NCC)."""
    from vdetlib_tpu.cli.pipeline_tool import main

    data = tmp_path / "data"
    data.mkdir()
    sv = make_video(
        SynthConfig(
            num_frames=4, height=HW[0], width=HW[1], num_classes=C,
            proposals_per_frame=R, seed=7,
        ),
        video="sc0",
    )
    vid = write_frames(sv, str(data))
    proto_dump(vid, str(data / "sc0.vid.json"))
    proto_dump(box_proto(sv), str(data / "sc0.box.json"))
    rc = main([
        str(data), str(tmp_path / "work"), "--model", "tiny",
        "--num_classes", str(C), "--image_hw", str(HW[0]), str(HW[1]),
        "--max_rois", str(R), "--max_tracks", "4", "--track_scales", "3",
        "--stages", "detect,track",
    ])
    assert rc == 0
    tracks = proto_load(str(tmp_path / "work" / "sc0" / "track.json"))
    assert tracks["method"] == "correlation_tracker"


def test_cli_keep_going_eval_exit_code(tmp_path):
    """--keep_going + --eval: failed video is skipped by eval, tool exits 1;
    the healthy video still gets a full final.json."""
    from vdetlib_tpu.cli.pipeline_tool import main

    data = tmp_path / "data"
    data.mkdir()
    sv = make_video(
        SynthConfig(
            num_frames=4, height=HW[0], width=HW[1], num_classes=C,
            proposals_per_frame=R, seed=8,
        ),
        video="kg0",
    )
    vid = write_frames(sv, str(data))
    proto_dump(vid, str(data / "kg0.vid.json"))
    proto_dump(box_proto(sv), str(data / "kg0.box.json"))
    proto_dump(annot_proto(sv), str(data / "kg0.annot.json"))
    bad = dict(
        vid, video="aabad",  # sorts first: failure precedes the good video
        frames=[dict(f, path="missing/" + f["path"]) for f in vid["frames"]],
    )
    proto_dump(bad, str(data / "aabad.vid.json"))
    proto_dump(box_proto(sv), str(data / "aabad.box.json"))

    argv = [
        str(data), str(tmp_path / "work"), "--model", "tiny",
        "--num_classes", str(C), "--image_hw", str(HW[0]), str(HW[1]),
        "--max_rois", str(R), "--max_tracks", "4", "--eval",
    ]
    assert main(argv + ["--keep_going"]) == 1
    assert not os.path.exists(str(tmp_path / "work" / "aabad" / "final.json"))
    assert os.path.exists(str(tmp_path / "work" / "kg0" / "final.json"))
    with pytest.raises(Exception):
        main(argv)  # strict mode still fails fast (fresh attempt on aabad)


def test_run_videos_batch(tmp_path, models, cfg):
    data = _dataset(tmp_path, n=2)
    m, _ = models
    results = run_videos(
        str(tmp_path / "work"),
        [(vid, box_proto(sv)) for sv, vid in data],
        m,
        cfg,
    )
    assert len(results) == 2
    for r in results:
        assert os.path.exists(r["result"])


def test_run_videos_keep_going(tmp_path, models, cfg):
    """Staged sweep: keep_going logs-and-skips a failing video (bad frame
    paths) instead of aborting; strict mode still raises."""
    import pytest

    data = _dataset(tmp_path, n=2)
    m, _ = models
    inputs = [(vid, box_proto(sv)) for sv, vid in data]
    bad_vid = dict(
        inputs[0][0], video="pbad",
        frames=[dict(f, path="missing/" + f["path"])
                for f in inputs[0][0]["frames"]],
    )
    sweep = [(bad_vid, inputs[0][1])] + inputs

    with pytest.raises(Exception):
        run_videos(str(tmp_path / "strict"), sweep, m, cfg)

    results = run_videos(str(tmp_path / "kg"), sweep, m, cfg, keep_going=True)
    assert results[0].get("error") and not os.path.exists(results[0]["result"])
    for r in results[1:]:
        assert not r.get("error")
        assert os.path.exists(r["result"])
    # workers>1 path too
    results_w = run_videos(
        str(tmp_path / "kgw"), sweep, m, cfg, workers=2, keep_going=True
    )
    assert results_w[0].get("error")
    assert all(os.path.exists(r["result"]) for r in results_w[1:])


def test_run_videos_workers_parity(tmp_path, models, cfg):
    """workers=2 (cross-video thread pipelining) yields byte-identical protos.

    The multi-worker staged sweep only overlaps host work with device work;
    each video's stage chain is untouched, so every proto must match the
    serial run exactly (same contract as fused/staged parity).
    """
    data = _dataset(tmp_path, n=3)
    m, _ = models
    inputs = [(vid, box_proto(sv)) for sv, vid in data]
    serial = run_videos(str(tmp_path / "w1"), inputs, m, cfg)
    threaded = run_videos(str(tmp_path / "w2"), inputs, m, cfg, workers=2)
    assert len(serial) == len(threaded) == 3
    for rs, rt in zip(serial, threaded):
        for stage in ("detect", "mgp", "track", "rescored", "final"):
            assert proto_load(rs[stage]) == proto_load(rt[stage]), stage
