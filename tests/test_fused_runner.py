"""Fused-engine sweep: wire-compatible protos + parity with the staged engine."""

import os

import numpy as np
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video, write_frames
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.pipeline.fused_runner import run_videos_fused
from vdetlib_tpu.pipeline.runner import Models, PipelineConfig, run_videos
from vdetlib_tpu.protos import proto_load
from vdetlib_tpu.video.detect import DetectOptions
from vdetlib_tpu.video.link import LinkOptions
from vdetlib_tpu.video.mgp import MGPOptions
from vdetlib_tpu.video.rescore import RescoreOptions
from vdetlib_tpu.video.track import TrackOptions, init_tracker

HW = (96, 128)
T, R, C = 6, 10, 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fused_runner")
    rng = np.random.default_rng(11)
    inputs = []
    for i in range(2):
        sv = make_video(
            SynthConfig(num_frames=T, height=HW[0], width=HW[1],
                        num_classes=C, seed=20 + i),
            video=f"fr{i}",
        )
        vid_proto = write_frames(sv, str(tmp))
        boxes = []
        for t, f in enumerate(vid_proto["frames"]):
            for r in range(R):
                x1 = rng.uniform(0, HW[1] - 12)
                y1 = rng.uniform(0, HW[0] - 12)
                w = rng.uniform(8, 50)
                h = rng.uniform(8, 50)
                boxes.append({
                    "frame": int(f["frame"]),
                    "bbox": [float(x1), float(y1),
                             float(min(x1 + w, HW[1] - 1)),
                             float(min(y1 + h, HW[0] - 1))],
                })
        inputs.append((vid_proto, {"video": sv.video, "boxes": boxes}))
    return tmp, inputs


@pytest.fixture(scope="module")
def models_cfg():
    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    models = Models(det_model, det_params, trk_model, trk_params)
    cfg = PipelineConfig(
        detect=DetectOptions(batch_size=3, max_rois=R, image_hw=HW,
                             score_thresh=0.005),
        mgp=MGPOptions(num_classes=C, max_boxes=24),
        track=TrackOptions(max_tracks=6, anchors_per_round=3, batch_size=3,
                           image_hw=HW),
        tracker_cfg=trk_cfg,
        rescore=RescoreOptions(num_classes=C, max_boxes=24, max_tracks=6),
        link=LinkOptions(num_classes=C, max_boxes=24, max_paths=8),
    )
    return models, cfg


def _index_dets(proto):
    idx = {}
    for d in proto["detections"]:
        for sc in d["scores"]:
            idx.setdefault((d["frame"], sc["class_index"]), []).append(
                (sc["score"], tuple(d["bbox"]))
            )
    for v in idx.values():
        v.sort()
    return idx


def test_fused_engine_matches_staged_engine(dataset, models_cfg, tmp_path):
    tmp, inputs = dataset
    models, cfg = models_cfg
    staged = run_videos(str(tmp_path / "staged"), inputs, models, cfg)
    fused = run_videos_fused(str(tmp_path / "fused"), inputs, models, cfg)
    assert len(staged) == len(fused) == 2
    for ps, pf in zip(staged, fused):
        a = _index_dets(proto_load(ps["result"]))
        b = _index_dets(proto_load(pf["result"]))
        assert set(a.keys()) == set(b.keys())
        n = 0
        for key in a:
            assert len(a[key]) == len(b[key]), key
            for (sa, ba), (sb, bb) in zip(a[key], b[key]):
                np.testing.assert_allclose(sa, sb, rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(ba, bb, rtol=1e-4, atol=1e-3)
                n += 1
        assert n > 0
        # tubelets too
        ta = proto_load(os.path.join(os.path.dirname(ps["result"]), "tubelets.json"))
        tb = proto_load(pf["tubelets"])
        assert len(ta["tracks"]) == len(tb["tracks"]) > 0


def test_fused_engine_resume_skips_done(dataset, models_cfg, tmp_path):
    tmp, inputs = dataset
    models, cfg = models_cfg
    work = str(tmp_path / "resume")
    first = run_videos_fused(work, inputs, models, cfg)
    mtimes = {p["final"]: os.path.getmtime(p["final"]) for p in first}
    second = run_videos_fused(work, inputs, models, cfg)
    for p in second:
        assert os.path.getmtime(p["final"]) == mtimes[p["final"]]  # untouched


def _broken_video(vid_proto, name):
    """vid_proto whose frame files don't exist (decode fails at load)."""
    return dict(
        vid_proto, video=name,
        frames=[dict(f, path="missing/" + f["path"]) for f in vid_proto["frames"]],
    )


def test_fused_keep_going_skips_bad_video(dataset, models_cfg, tmp_path):
    """A video that fails to load aborts the sweep by default; with
    keep_going it is marked failed (no final.json) and the rest complete."""
    tmp, inputs = dataset
    models, cfg = models_cfg
    bad = (_broken_video(inputs[0][0], "frbad"), inputs[0][1])
    sweep = [bad] + list(inputs)

    with pytest.raises(Exception):
        run_videos_fused(str(tmp_path / "strict"), sweep, models, cfg)

    results = run_videos_fused(
        str(tmp_path / "kg"), sweep, models, cfg, keep_going=True
    )
    assert results[0].get("error") and not os.path.exists(results[0]["final"])
    for p in results[1:]:
        assert not p.get("error")
        assert os.path.exists(p["final"])


def test_fused_engine_grouped_dispatch(dataset, models_cfg, tmp_path):
    """group_size>1 batches same-bucket videos into one vmapped dispatch:
    outputs are valid per-video protos, deterministic across runs, and
    near the single-dispatch outputs (the batched program's bf16
    reassociation may flip near-tied NMS decisions — that is why grouping
    is opt-in and the strict parity contract holds only at group_size=1)."""
    tmp, inputs = dataset
    models, cfg = models_cfg
    single = run_videos_fused(str(tmp_path / "g1"), inputs, models, cfg)
    g_a = run_videos_fused(
        str(tmp_path / "ga"), inputs, models, cfg, group_size=2
    )
    g_b = run_videos_fused(
        str(tmp_path / "gb"), inputs, models, cfg, group_size=2
    )
    assert len(g_a) == len(single) == 2
    for ps, pa, pb in zip(single, g_a, g_b):
        da = proto_load(pa["result"])
        db = proto_load(pb["result"])
        ds = proto_load(ps["result"])
        # determinism: two grouped runs are byte-identical
        assert da == db
        assert len(da["detections"]) > 0
        ta = proto_load(pa["tubelets"])
        assert len(ta["tracks"]) > 0
        # near-parity with the single-dispatch outputs: same (frame, class)
        # coverage on the overwhelming majority of entries
        ia, i_s = _index_dets(da), _index_dets(ds)
        common = set(ia) & set(i_s)
        assert len(common) >= 0.9 * max(len(ia), len(i_s))
        close = total = 0
        for k in common:
            for (sa, ba), (ss, bs) in zip(ia[k], i_s[k]):
                total += 1
                if abs(sa - ss) < 5e-3:
                    close += 1
        # an UNTRAINED net amplifies the cascades (near-tied scores
        # everywhere), so only a majority criterion is stable here; with
        # trained weights the decisive margins make grouped ≈ single.
        assert close >= 0.6 * total, (close, total)
