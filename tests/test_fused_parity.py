"""Fused-pipeline fidelity: the single-jit program must match the staged path.

VERDICT r1 item #2: the benchmarked fused pipeline historically diverged from
the staged (wire-compatible) stages — MGP output was dead, rescore/seq-NMS ran
on raw rois. This test locks the unification: the fused program's final
det_proto and tubelet track_proto equal the staged detect → MGP → track →
rescore → seq-NMS stages' output at a matched config (float tolerance).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.loader import FrameLoader
from vdetlib_tpu.data.synth import SynthConfig, make_video, write_frames
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.pipeline.fused import (
    FusedConfig,
    fused_to_protos,
    make_fused_pipeline,
)
from vdetlib_tpu.video.detect import DetectOptions, det_vid
from vdetlib_tpu.video.link import LinkOptions, seq_nms_video
from vdetlib_tpu.video.mgp import MGPOptions, mgp
from vdetlib_tpu.video.rescore import RescoreOptions, tubelet_rescore
from vdetlib_tpu.video.track import TrackOptions, init_tracker, track_from_det

HW = (96, 128)
T, R, C = 8, 12, 4
BUDGET = 24


@pytest.fixture(scope="module")
def matched_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    sv = make_video(
        SynthConfig(num_frames=T, height=HW[0], width=HW[1], num_classes=C, seed=7),
        video="vid_parity",
    )
    vid_proto = write_frames(sv, str(tmp))

    rng = np.random.default_rng(7)
    rois = np.zeros((T, R, 4), np.float32)
    for t in range(T):
        x1 = rng.uniform(0, HW[1] - 10, R)
        y1 = rng.uniform(0, HW[0] - 10, R)
        w = rng.uniform(8, 60, R)
        h = rng.uniform(8, 60, R)
        rois[t] = np.stack(
            [x1, y1, np.minimum(x1 + w, HW[1] - 1), np.minimum(y1 + h, HW[0] - 1)],
            axis=1,
        )
    box_proto = {
        "video": vid_proto["video"],
        "boxes": [
            {"frame": int(f["frame"]), "bbox": [float(v) for v in rois[t, r]]}
            for t, f in enumerate(vid_proto["frames"])
            for r in range(R)
        ],
    }

    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)

    # frames exactly as the staged stages see them (decoded from disk)
    loader = FrameLoader(vid_proto, target_hw=HW)
    frames_u8 = np.stack([img for _, img, _ in loader.iter_frames()])
    loader.close()

    return dict(
        vid_proto=vid_proto,
        box_proto=box_proto,
        rois=rois,
        frames_u8=frames_u8,
        det_model=det_model,
        det_params=det_params,
        trk_model=trk_model,
        trk_params=trk_params,
        trk_cfg=trk_cfg,
    )


def _staged_protos(s, tubelet_boxes=False, min_matched_frac=0.0,
                   track_stride=1):
    det_opts = DetectOptions(
        batch_size=4, max_rois=R, image_hw=HW, score_thresh=0.005, regress=True
    )
    mgp_opts = MGPOptions(
        window=1, score_decay=0.9, nms_thresh=0.3, max_boxes=BUDGET,
        num_classes=C, flow_preset="fast",
    )
    trk_opts = TrackOptions(
        max_tracks=6, anchors_per_round=3, anchor_thresh=0.3, conf_thresh=0.5,
        cover_thresh=0.5, batch_size=4, image_hw=HW,
        frame_stride=track_stride,
    )
    res_opts = RescoreOptions(
        match_thresh=0.5, top_ratio=0.5, boost="max", bg_decay=1.0,
        max_boxes=BUDGET, num_classes=C, max_tracks=6,
        tubelet_boxes=tubelet_boxes, min_matched_frac=min_matched_frac,
    )
    link_opts = LinkOptions(
        link_thresh=0.5, suppress_thresh=0.3, max_paths=8, rescore="avg",
        max_boxes=BUDGET, num_classes=C, min_score=0.0, backend="device",
    )
    det_proto = det_vid(
        s["det_model"], s["det_params"], s["vid_proto"], s["box_proto"], det_opts
    )
    cur = mgp(s["vid_proto"], det_proto, opts=mgp_opts, frames_u8=s["frames_u8"])
    trk = track_from_det(
        s["trk_model"], s["trk_params"], s["vid_proto"], cur, s["trk_cfg"],
        trk_opts, frames_u8=s["frames_u8"],
    )
    _, cur = tubelet_rescore(s["vid_proto"], cur, trk, res_opts)
    final, tubelets = seq_nms_video(s["vid_proto"], cur, link_opts)
    return final, tubelets, trk


def _fused_protos(s, tubelet_boxes=False, min_matched_frac=0.0,
                  track_stride=1):
    cfg = FusedConfig(
        image_hw=HW, detect_batch=4, feat_batch=4, score_thresh=0.005,
        mgp_window=1, mgp_decay=0.9, nms_thresh=0.3, det_budget=BUDGET,
        out_budget=BUDGET, max_tracks=6, anchors_per_round=3, anchor_thresh=0.3,
        track_conf=0.5, cover_thresh=0.5, rescore_match=0.5, top_ratio=0.5,
        boost="max", bg_decay=1.0, link_thresh=0.5, suppress_thresh=0.3,
        max_paths=8, link_rescore="avg", flow_preset="fast",
        tubelet_boxes=tubelet_boxes, min_matched_frac=min_matched_frac,
        track_stride=track_stride,
    )
    pipe = make_fused_pipeline(s["det_model"], s["trk_model"], s["trk_cfg"], cfg)
    out = pipe(
        s["det_params"], s["trk_params"],
        jnp.asarray(s["frames_u8"]), jnp.asarray(s["rois"]),
    )
    fids = [f["frame"] for f in s["vid_proto"]["frames"]]
    det_proto, tubelets = fused_to_protos(out, fids, s["vid_proto"]["video"])
    return det_proto, tubelets, out


def _index_dets(proto):
    """{(frame, class): [(score, bbox)]} sorted for order-insensitive compare."""
    idx = {}
    for d in proto["detections"]:
        for sc in d["scores"]:
            idx.setdefault((d["frame"], sc["class_index"]), []).append(
                (sc["score"], tuple(d["bbox"]))
            )
    for v in idx.values():
        v.sort()
    return idx


def test_fused_matches_staged_final_dets(matched_setup):
    staged_det, staged_tub, _ = _staged_protos(matched_setup)
    fused_det, fused_tub, _ = _fused_protos(matched_setup)

    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    # the pipeline actually produced something to compare
    assert len(staged_det["detections"]) > 0


def test_fused_matches_staged_at_track_stride2(matched_setup):
    """Engine parity at track_stride=2 — both engines now compute tracker
    features for SAMPLED frames only (track_batch feats_strided contract);
    final dets must still agree, and the strided run must differ from the
    stride-1 run (precondition: the knob actually changes the output here,
    so this test cannot silently degenerate into the stride-1 case)."""
    staged_det, _, staged_trk = _staged_protos(matched_setup, track_stride=2)
    fused_det, _, _ = _fused_protos(matched_setup, track_stride=2)

    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_det["detections"]) > 0
    assert len(staged_trk["tracks"]) > 0
    # precondition: stride actually engaged — TRACK boxes must differ from
    # the stride-1 run somewhere (final dets may legitimately coincide:
    # rescoring only reads the det-match SET, which small box changes need
    # not flip — but identical track boxes would mean the knob is dead)
    _, _, base_trk = _staged_protos(matched_setup)
    def _track_boxes(tp):
        return [
            tuple(tuple(b["bbox"]) for b in tr) for tr in tp["tracks"]
        ]
    assert _track_boxes(staged_trk) != _track_boxes(base_trk), (
        "stride-2 track boxes identical to stride-1 — fixture no longer "
        "exercises the stride path"
    )


def test_fused_matches_staged_tubelets(matched_setup):
    staged_det, staged_tub, _ = _staged_protos(matched_setup)
    fused_det, fused_tub, _ = _fused_protos(matched_setup)
    assert len(staged_tub["tracks"]) == len(fused_tub["tracks"]) > 0
    for ta, tb in zip(staged_tub["tracks"], fused_tub["tracks"]):
        assert len(ta) == len(tb)
        for ea, eb in zip(ta, tb):
            assert ea["frame"] == eb["frame"]
            assert ea["class_index"] == eb["class_index"]
            np.testing.assert_allclose(ea["score"], eb["score"], rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(ea["bbox"], eb["bbox"], rtol=1e-4, atol=1e-3)


def test_fused_matches_staged_with_tubelet_boxes(matched_setup):
    """Parity holds with tubelet-box injection on (VERDICT r2 item 2)."""
    staged_det, staged_tub, _ = _staged_protos(matched_setup, tubelet_boxes=True)
    fused_det, fused_tub, _ = _fused_protos(matched_setup, tubelet_boxes=True)

    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_tub["tracks"]) == len(fused_tub["tracks"])
    for ta, tb in zip(staged_tub["tracks"], fused_tub["tracks"]):
        assert len(ta) == len(tb)
        for ea, eb in zip(ta, tb):
            assert ea["frame"] == eb["frame"]
            assert ea["class_index"] == eb["class_index"]
            np.testing.assert_allclose(ea["bbox"], eb["bbox"], rtol=1e-4, atol=1e-3)


def test_fused_matches_staged_with_matched_frac_gate(matched_setup):
    """Parity holds with the track-quality gate active alongside injection."""
    kw = dict(tubelet_boxes=True, min_matched_frac=0.4)
    staged_det, staged_tub, _ = _staged_protos(matched_setup, **kw)
    fused_det, fused_tub, _ = _fused_protos(matched_setup, **kw)
    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_tub["tracks"]) == len(fused_tub["tracks"])


def test_fused_track_count_matches_staged(matched_setup):
    _, _, staged_trk = _staged_protos(matched_setup)
    _, _, out = _fused_protos(matched_setup)
    assert int(out.n_tracks) == len(staged_trk["tracks"]) > 0


@pytest.mark.parametrize("tubelet_boxes", [False, True])
def test_fused_matches_staged_varying_slot_layout(matched_setup, tubelet_boxes):
    """Parity when the per-frame slot LAYOUT varies frame to frame.

    Regression test for the fused-MGP class-alignment bug (round 3): every
    per-slot attribute of a propagated block must be shifted from the
    SOURCE frame; the original code tiled the class array unshifted, so a
    propagated copy inherited the DESTINATION slot's class. Invisible when
    every frame packs the same (roi, class) slots in the same order — which
    the other parity tests' low score_thresh guarantees — so this test
    raises the threshold until the kept set (and hence slot layout)
    genuinely differs across frames, and runs a 2-hop MGP window.
    """
    s = matched_setup
    det_opts = DetectOptions(
        batch_size=4, max_rois=R, image_hw=HW, score_thresh=0.26, regress=True
    )
    mgp_opts = MGPOptions(
        window=2, score_decay=0.9, nms_thresh=0.3, max_boxes=BUDGET,
        num_classes=C, flow_preset="fast",
    )
    trk_opts = TrackOptions(
        max_tracks=6, anchors_per_round=3, anchor_thresh=0.3, conf_thresh=0.5,
        cover_thresh=0.5, batch_size=4, image_hw=HW,
    )
    res_opts = RescoreOptions(
        match_thresh=0.5, top_ratio=0.5, boost="max", bg_decay=0.7,
        max_boxes=BUDGET, num_classes=C, max_tracks=6,
        tubelet_boxes=tubelet_boxes,
    )
    link_opts = LinkOptions(
        link_thresh=0.5, suppress_thresh=0.3, max_paths=8, rescore="avg",
        max_boxes=BUDGET, num_classes=C, min_score=0.0, backend="device",
    )
    det_proto = det_vid(
        s["det_model"], s["det_params"], s["vid_proto"], s["box_proto"], det_opts
    )
    # the regression precondition: per-frame slot layouts must differ
    from collections import defaultdict
    per_frame = defaultdict(list)
    for d in det_proto["detections"]:
        for sc in d["scores"]:
            per_frame[d["frame"]].append(sc["class_index"])
    layouts = {f: tuple(v) for f, v in sorted(per_frame.items())}
    assert len(set(layouts.values())) > 1, (
        "test setup no longer varies the slot layout; lower score_thresh "
        f"differently (layouts: {layouts})"
    )
    cur = mgp(s["vid_proto"], det_proto, opts=mgp_opts, frames_u8=s["frames_u8"])
    trk = track_from_det(
        s["trk_model"], s["trk_params"], s["vid_proto"], cur, s["trk_cfg"],
        trk_opts, frames_u8=s["frames_u8"],
    )
    _, cur = tubelet_rescore(s["vid_proto"], cur, trk, res_opts)
    staged_det, _ = seq_nms_video(s["vid_proto"], cur, link_opts)

    cfg = FusedConfig(
        image_hw=HW, detect_batch=4, feat_batch=4, score_thresh=0.26,
        mgp_window=2, mgp_decay=0.9, nms_thresh=0.3, det_budget=BUDGET,
        out_budget=BUDGET, max_tracks=6, anchors_per_round=3, anchor_thresh=0.3,
        track_conf=0.5, cover_thresh=0.5, rescore_match=0.5, top_ratio=0.5,
        boost="max", bg_decay=0.7, link_thresh=0.5, suppress_thresh=0.3,
        max_paths=8, link_rescore="avg", flow_preset="fast",
        tubelet_boxes=tubelet_boxes,
    )
    pipe = make_fused_pipeline(s["det_model"], s["trk_model"], s["trk_cfg"], cfg)
    out = pipe(
        s["det_params"], s["trk_params"],
        jnp.asarray(s["frames_u8"]), jnp.asarray(s["rois"]),
    )
    fids = [f["frame"] for f in s["vid_proto"]["frames"]]
    fused_det, _ = fused_to_protos(out, fids, s["vid_proto"]["video"])

    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_det["detections"]) > 0


def test_fused_matches_staged_varying_roi_counts(matched_setup):
    """Parity when the number of VALID proposals varies frame to frame.

    Companion to the varying-slot-layout regression test: the module fixture
    always supplies a full (T, R) proposal set, so `roi_mask` is trivially
    all-True in every other parity test. Real box protos have per-frame
    proposal counts (FusedEngine.load builds a genuine mask via
    box_proto_to_arrays). Here the staged path gets a box_proto listing only
    a per-frame-varying prefix of the rois, while the fused path gets the
    padded (T, R, 4) array with DECOY boxes (a plausible centered window, not
    zeros) in the masked slots — per the padding convention, masks are
    authoritative and padded-slot values must never leak into any output.
    """
    s = matched_setup
    rng = np.random.default_rng(11)
    counts = rng.integers(R // 3, R + 1, size=T)
    counts[0] = R  # at least one full frame keeps the layouts diverse
    assert len(set(int(c) for c in counts)) > 1
    box_proto = {
        "video": s["vid_proto"]["video"],
        "boxes": [
            {"frame": int(f["frame"]), "bbox": [float(v) for v in s["rois"][t, r]]}
            for t, f in enumerate(s["vid_proto"]["frames"])
            for r in range(int(counts[t]))
        ],
    }
    rois = np.array(s["rois"], np.float32, copy=True)
    decoy = np.array(
        [HW[1] * 0.25, HW[0] * 0.25, HW[1] * 0.75, HW[0] * 0.75], np.float32
    )
    roi_mask = np.zeros((T, R), bool)
    for t in range(T):
        roi_mask[t, : int(counts[t])] = True
        rois[t, int(counts[t]) :] = decoy

    det_opts = DetectOptions(
        batch_size=4, max_rois=R, image_hw=HW, score_thresh=0.005, regress=True
    )
    mgp_opts = MGPOptions(
        window=1, score_decay=0.9, nms_thresh=0.3, max_boxes=BUDGET,
        num_classes=C, flow_preset="fast",
    )
    trk_opts = TrackOptions(
        max_tracks=6, anchors_per_round=3, anchor_thresh=0.3, conf_thresh=0.5,
        cover_thresh=0.5, batch_size=4, image_hw=HW,
    )
    res_opts = RescoreOptions(
        match_thresh=0.5, top_ratio=0.5, boost="max", bg_decay=1.0,
        max_boxes=BUDGET, num_classes=C, max_tracks=6,
    )
    link_opts = LinkOptions(
        link_thresh=0.5, suppress_thresh=0.3, max_paths=8, rescore="avg",
        max_boxes=BUDGET, num_classes=C, min_score=0.0, backend="device",
    )
    det_proto = det_vid(
        s["det_model"], s["det_params"], s["vid_proto"], box_proto, det_opts
    )
    cur = mgp(s["vid_proto"], det_proto, opts=mgp_opts, frames_u8=s["frames_u8"])
    trk = track_from_det(
        s["trk_model"], s["trk_params"], s["vid_proto"], cur, s["trk_cfg"],
        trk_opts, frames_u8=s["frames_u8"],
    )
    _, cur = tubelet_rescore(s["vid_proto"], cur, trk, res_opts)
    staged_det, _ = seq_nms_video(s["vid_proto"], cur, link_opts)

    cfg = FusedConfig(
        image_hw=HW, detect_batch=4, feat_batch=4, score_thresh=0.005,
        mgp_window=1, mgp_decay=0.9, nms_thresh=0.3, det_budget=BUDGET,
        out_budget=BUDGET, max_tracks=6, anchors_per_round=3, anchor_thresh=0.3,
        track_conf=0.5, cover_thresh=0.5, rescore_match=0.5, top_ratio=0.5,
        boost="max", bg_decay=1.0, link_thresh=0.5, suppress_thresh=0.3,
        max_paths=8, link_rescore="avg", flow_preset="fast",
    )
    pipe = make_fused_pipeline(s["det_model"], s["trk_model"], s["trk_cfg"], cfg)
    out = pipe(
        s["det_params"], s["trk_params"],
        jnp.asarray(s["frames_u8"]), jnp.asarray(rois),
        roi_mask=jnp.asarray(roi_mask),
    )
    fids = [f["frame"] for f in s["vid_proto"]["frames"]]
    fused_det, _ = fused_to_protos(out, fids, s["vid_proto"]["video"])

    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_det["detections"]) > 0


def test_fused_matches_staged_multiscale_tracker(matched_setup):
    """Scale-adaptive tracking (num_scales=3) parity across engines — the
    end-to-end tracker win (RESULTS.md SC table) was measured on the staged
    path; the fused flagship must produce the same tubelets."""
    s = dict(matched_setup)
    trk_cfg = TrackerConfig(num_scales=3)
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    s.update(trk_cfg=trk_cfg, trk_model=trk_model, trk_params=trk_params)
    staged_det, staged_tub, _ = _staged_protos(s)
    fused_det, fused_tub, _ = _fused_protos(s)
    a = _index_dets(staged_det)
    b = _index_dets(fused_det)
    assert set(a.keys()) == set(b.keys())
    for key in a:
        sa, sb = a[key], b[key]
        assert len(sa) == len(sb), f"{key}: {len(sa)} vs {len(sb)} dets"
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(bb_a, bb_b, rtol=1e-4, atol=1e-3)
    assert len(staged_tub["tracks"]) == len(fused_tub["tracks"]) > 0
    for ta, tb in zip(staged_tub["tracks"], fused_tub["tracks"]):
        assert len(ta) == len(tb)
        for ea, eb in zip(ta, tb):
            assert ea["frame"] == eb["frame"]
            np.testing.assert_allclose(ea["bbox"], eb["bbox"], rtol=1e-4, atol=1e-3)
