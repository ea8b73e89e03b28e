"""Randomized cross-engine differential harness (VERDICT r3 item #2).

The round-3 fused-MGP class-alignment bug survived 200+ green tests because
every parity fixture accidentally held the per-frame slot layout constant
(CLAUDE.md "Parity-test blind spots"). This harness institutionalizes the
lesson: sample (config x data) draws, run the STAGED stage chain
(detect -> MGP -> track -> rescore -> seq-NMS, the wire-compatible path) and
the FUSED single-jit program on identical inputs, and require the final
det_proto + tubelet track_proto to be equal within float tolerance.

Two structural defenses against the fixture-coincidence bug class:

1. Every varied dimension is MEASURED into per-case descriptors
   (slot-layout diversity, per-frame valid-roi diversity, padded-tail use,
   track/tubelet counts). A corpus asserts its own diversity — if sampler
   drift ever re-converges on one regime, the corpus test fails loudly
   instead of silently going blind.
2. Seeds are data, not code: the CI subset (tests/test_differential_fuzz.py)
   pins a screened corpus; the sweep script (scripts/fuzz_differential.py)
   samples fresh seeds and records every draw to JSONL so any divergence
   becomes a pinned regression fixture.

Reference parity note: the reference library has no analogous harness —
SURVEY.md section 4 records that it shipped with no test suite at all; the
rebuild's "bit-for-bit within float tolerance" contract (SURVEY.md section 4,
BASELINE.json) is what this enforces across engines.

Engines compile per (config, shape); data draws reuse compiled programs. The
harness therefore fixes shapes (HW/T_PAD/R/C match tests/test_fused_parity.py
so persistent-cache entries are shared) and pushes variation into masks,
pixels, scores, and config scalars.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import asdict, dataclass, replace

import numpy as np

# Shapes are harness-wide constants: every distinct shape costs a full XLA
# compile of both engines, while masks (roi_mask, t_valid) vary for free.
HW = (96, 128)
T_PAD = 8
R = 12
C = 4

RTOL, ATOL_SCORE, ATOL_BOX = 1e-4, 1e-5, 1e-3


@dataclass(frozen=True)
class ConfigDraw:
    """One sampled pipeline configuration (identical across both engines)."""

    seed: int
    score_thresh: float
    mgp_window: int
    mgp_decay: float
    nms_thresh: float
    det_budget: int
    out_budget: int
    max_tracks: int
    anchors_per_round: int
    anchor_thresh: float
    track_conf: float
    cover_thresh: float
    rescore_match: float
    top_ratio: float
    boost: str
    bg_decay: float
    min_matched_frac: float
    tubelet_boxes: bool
    link_thresh: float
    suppress_thresh: float
    max_paths: int
    link_rescore: str
    flow_preset: str
    # round-4 accuracy knobs — drawn from a SEPARATE rng stream so the
    # pre-existing screened corpus seeds keep producing identical configs
    # for every older field.
    snap_weight: float = 0.0
    snap_iou: float = 0.5
    stat_floor: int = 0


@dataclass(frozen=True)
class DataDraw:
    """One sampled input video + proposal set."""

    seed: int
    tier: str  # easy | hard
    t_real: int  # <= T_PAD; fused path pads the tail and carries t_valid
    vary_roi_counts: bool
    proposal_style: str  # jittered_gt | random | mixed
    num_objects: int
    max_speed: float


def sample_config(seed: int) -> ConfigDraw:
    rng = np.random.default_rng(seed)

    def pick(xs):
        return xs[int(rng.integers(len(xs)))]

    rng2 = np.random.default_rng(seed ^ 0xA11CE)  # round-4 knob stream

    def pick2(xs):
        return xs[int(rng2.integers(len(xs)))]

    det_budget = int(pick([24, 32]))
    return ConfigDraw(
        seed=seed,
        score_thresh=float(pick([0.005, 0.05, 0.15, 0.26])),
        mgp_window=int(pick([1, 2])),
        mgp_decay=float(pick([0.9, 0.7])),
        nms_thresh=float(pick([0.3, 0.45])),
        det_budget=det_budget,
        out_budget=int(min(det_budget, pick([16, 24]))),
        max_tracks=int(pick([4, 6])),
        anchors_per_round=int(pick([2, 3])),
        anchor_thresh=float(pick([0.25, 0.3, 0.4])),
        track_conf=float(pick([0.4, 0.5])),
        cover_thresh=float(pick([0.4, 0.5])),
        rescore_match=float(pick([0.4, 0.5])),
        top_ratio=float(pick([0.3, 0.5, 1.0])),
        boost=pick(["max", "mean"]),
        bg_decay=float(pick([1.0, 0.7])),
        min_matched_frac=float(pick([0.0, 0.0, 0.4])),
        tubelet_boxes=bool(pick([False, False, True])),
        link_thresh=float(pick([0.4, 0.5])),
        suppress_thresh=float(pick([0.3, 0.45])),
        max_paths=int(pick([6, 8, 12])),
        link_rescore=pick(["avg", "max"]),
        flow_preset=pick(["fast", "fastest"]),
        snap_weight=float(pick2([0.0, 0.5, 0.75])),
        snap_iou=float(pick2([0.4, 0.5])),
        stat_floor=int(pick2([0, 3, 5])),
    )


def sample_data(seed: int) -> DataDraw:
    rng = np.random.default_rng(seed ^ 0x5EED)
    return DataDraw(
        seed=seed,
        tier="hard" if rng.random() < 0.5 else "easy",
        t_real=int(rng.integers(6, T_PAD + 1)),
        vary_roi_counts=bool(rng.random() < 0.6),
        proposal_style=["jittered_gt", "random", "mixed"][int(rng.integers(3))],
        num_objects=int(rng.integers(2, 4)),
        max_speed=float(rng.choice([2.0, 4.0])),
    )


def init_models(seed: int = 0):
    """Shared detector + tracker for a corpus (fixed shapes, one compile set)."""
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.video.track import init_tracker

    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=seed)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=seed)
    return dict(
        det_model=det_model,
        det_params=det_params,
        trk_model=trk_model,
        trk_params=trk_params,
        trk_cfg=trk_cfg,
    )


def build_inputs(dd: DataDraw, root: str):
    """DataDraw -> (vid_proto, box_proto, frames_u8, rois, roi_mask, counts).

    Frames go through disk JPEG + FrameLoader so the staged path sees exactly
    the decoded pixels the fused path is handed (same convention as
    tests/test_fused_parity.py).
    """
    from vdetlib_tpu.data.loader import FrameLoader
    from vdetlib_tpu.data.synth import SynthConfig, hard_config, make_video, write_frames

    base = dict(
        num_frames=dd.t_real,
        height=HW[0],
        width=HW[1],
        num_classes=C,
        seed=dd.seed,
        num_objects=dd.num_objects,
        max_speed=dd.max_speed,
    )
    if dd.tier == "hard":
        cfg = hard_config(**base)
    else:
        cfg = SynthConfig(class_coded_appearance=True, **base)
    sv = make_video(cfg, video=f"fuzz{dd.seed:05d}")
    vid_proto = write_frames(sv, root)

    rng = np.random.default_rng(dd.seed + 1)
    T = dd.t_real
    K = sv.gt_boxes.shape[0]
    rois = np.zeros((T, R, 4), np.float32)
    hi = np.array([HW[1] - 1, HW[0] - 1, HW[1] - 1, HW[0] - 1], np.float32)
    for t in range(T):
        n = 0
        if dd.proposal_style in ("jittered_gt", "mixed"):
            per = max(1, (R // 2) // max(K, 1)) if dd.proposal_style == "mixed" else 3
            for k in range(K):
                for _ in range(per):
                    if n < R:
                        rois[t, n] = np.clip(
                            sv.gt_boxes[k, t] + rng.normal(0, 2.5, 4), 0, hi
                        )
                        n += 1
        while n < R:
            x1 = rng.uniform(0, HW[1] - 12)
            y1 = rng.uniform(0, HW[0] - 12)
            rois[t, n] = [
                x1,
                y1,
                min(x1 + rng.uniform(8, 60), HW[1] - 1),
                min(y1 + rng.uniform(8, 60), HW[0] - 1),
            ]
            n += 1
    # ensure well-formed (x2>x1, y2>y1) after jitter/clip — both engines get
    # the identical array either way; this just keeps the draw physically sane
    rois[..., 2] = np.maximum(rois[..., 2], rois[..., 0] + 1.0)
    rois[..., 3] = np.maximum(rois[..., 3], rois[..., 1] + 1.0)

    if dd.vary_roi_counts:
        counts = rng.integers(max(2, R // 3), R + 1, size=T)
        counts[int(rng.integers(T))] = R  # keep at least one full frame
    else:
        counts = np.full(T, R, np.int64)
    roi_mask = np.zeros((T, R), bool)
    decoy = np.array(
        [HW[1] * 0.25, HW[0] * 0.25, HW[1] * 0.75, HW[0] * 0.75], np.float32
    )
    for t in range(T):
        roi_mask[t, : int(counts[t])] = True
        rois[t, int(counts[t]) :] = decoy  # padded slots must never leak

    box_proto = {
        "video": vid_proto["video"],
        "boxes": [
            {"frame": int(f["frame"]), "bbox": [float(v) for v in rois[t, r]]}
            for t, f in enumerate(vid_proto["frames"])
            for r in range(int(counts[t]))
        ],
    }

    loader = FrameLoader(vid_proto, target_hw=HW)
    frames_u8 = np.stack([img for _, img, _ in loader.iter_frames()])
    loader.close()
    return vid_proto, box_proto, frames_u8, rois, roi_mask, counts


def _staged_opts(cd: ConfigDraw):
    from vdetlib_tpu.video.detect import DetectOptions
    from vdetlib_tpu.video.link import LinkOptions
    from vdetlib_tpu.video.mgp import MGPOptions
    from vdetlib_tpu.video.rescore import RescoreOptions
    from vdetlib_tpu.video.track import TrackOptions

    det = DetectOptions(
        batch_size=4, max_rois=R, image_hw=HW,
        score_thresh=cd.score_thresh, regress=True,
    )
    mgp = MGPOptions(
        window=cd.mgp_window, score_decay=cd.mgp_decay, nms_thresh=cd.nms_thresh,
        max_boxes=cd.det_budget, num_classes=C, flow_preset=cd.flow_preset,
    )
    trk = TrackOptions(
        max_tracks=cd.max_tracks, anchors_per_round=cd.anchors_per_round,
        anchor_thresh=cd.anchor_thresh, conf_thresh=cd.track_conf,
        cover_thresh=cd.cover_thresh, batch_size=4, image_hw=HW,
        snap_weight=cd.snap_weight, snap_iou=cd.snap_iou,
    )
    res = RescoreOptions(
        match_thresh=cd.rescore_match, top_ratio=cd.top_ratio, boost=cd.boost,
        bg_decay=cd.bg_decay, max_boxes=cd.out_budget, num_classes=C,
        max_tracks=cd.max_tracks, tubelet_boxes=cd.tubelet_boxes,
        min_matched_frac=cd.min_matched_frac, stat_floor=cd.stat_floor,
    )
    link = LinkOptions(
        link_thresh=cd.link_thresh, suppress_thresh=cd.suppress_thresh,
        max_paths=cd.max_paths, rescore=cd.link_rescore,
        max_boxes=cd.out_budget, num_classes=C, min_score=0.0, backend="device",
    )
    return det, mgp, trk, res, link


def _fused_config(cd: ConfigDraw):
    from vdetlib_tpu.pipeline.fused import FusedConfig

    return FusedConfig(
        image_hw=HW, detect_batch=4, feat_batch=4,
        score_thresh=cd.score_thresh, mgp_window=cd.mgp_window,
        mgp_decay=cd.mgp_decay, nms_thresh=cd.nms_thresh,
        det_budget=cd.det_budget, out_budget=cd.out_budget,
        max_tracks=cd.max_tracks, anchors_per_round=cd.anchors_per_round,
        anchor_thresh=cd.anchor_thresh, track_conf=cd.track_conf,
        cover_thresh=cd.cover_thresh, rescore_match=cd.rescore_match,
        top_ratio=cd.top_ratio, boost=cd.boost, bg_decay=cd.bg_decay,
        min_matched_frac=cd.min_matched_frac, tubelet_boxes=cd.tubelet_boxes,
        link_thresh=cd.link_thresh, suppress_thresh=cd.suppress_thresh,
        max_paths=cd.max_paths, link_rescore=cd.link_rescore,
        flow_preset=cd.flow_preset,
        snap_weight=cd.snap_weight, snap_iou=cd.snap_iou,
        stat_floor=cd.stat_floor,
    )


def index_dets(proto: dict) -> dict:
    """{(frame, class): sorted [(score, bbox)]} — order-insensitive compare."""
    idx = {}
    for d in proto["detections"]:
        for sc in d["scores"]:
            idx.setdefault((d["frame"], sc["class_index"]), []).append(
                (sc["score"], tuple(d["bbox"]))
            )
    for v in idx.values():
        v.sort()
    return idx


def compare_det_protos(a: dict, b: dict) -> list:
    """Float-tolerance equality of two det protos; returns mismatch strings."""
    ia, ib = index_dets(a), index_dets(b)
    out = []
    for key in sorted(set(ia) | set(ib)):
        sa, sb = ia.get(key, []), ib.get(key, [])
        if len(sa) != len(sb):
            out.append(f"{key}: count {len(sa)} vs {len(sb)}")
            continue
        for (sc_a, bb_a), (sc_b, bb_b) in zip(sa, sb):
            if not np.allclose(sc_a, sc_b, rtol=RTOL, atol=ATOL_SCORE):
                out.append(f"{key}: score {sc_a} vs {sc_b}")
            elif not np.allclose(bb_a, bb_b, rtol=RTOL, atol=ATOL_BOX):
                out.append(f"{key}: bbox {bb_a} vs {bb_b}")
    return out


def compare_tubelets(a: dict, b: dict) -> list:
    out = []
    if len(a["tracks"]) != len(b["tracks"]):
        return [f"track count {len(a['tracks'])} vs {len(b['tracks'])}"]
    for i, (ta, tb) in enumerate(zip(a["tracks"], b["tracks"])):
        if len(ta) != len(tb):
            out.append(f"track {i}: len {len(ta)} vs {len(tb)}")
            continue
        for ea, eb in zip(ta, tb):
            if ea["frame"] != eb["frame"] or ea.get("class_index") != eb.get(
                "class_index"
            ):
                out.append(f"track {i}: frame/class {ea} vs {eb}")
            elif not np.allclose(ea["score"], eb["score"], rtol=RTOL, atol=ATOL_SCORE):
                out.append(f"track {i}@{ea['frame']}: score")
            elif not np.allclose(
                np.asarray(ea["bbox"]), np.asarray(eb["bbox"]), rtol=RTOL, atol=ATOL_BOX
            ):
                out.append(f"track {i}@{ea['frame']}: bbox")
    return out


def run_case(models: dict, cd: ConfigDraw, dd: DataDraw, root: str | None = None) -> dict:
    """Run one (config, data) draw through both engines; return a report.

    Report keys: ok (bool), mismatches (list[str]), descriptors (dict of
    measured variation — the anti-coincidence telemetry), cfg/data (asdicts).
    """
    import jax
    import jax.numpy as jnp

    from vdetlib_tpu.pipeline.fused import (
        fused_to_protos,
        make_fused_pipeline,
        pad_snippet,
    )
    from vdetlib_tpu.video.detect import det_vid
    from vdetlib_tpu.video.link import seq_nms_video
    from vdetlib_tpu.video.mgp import mgp as mgp_stage
    from vdetlib_tpu.video.rescore import tubelet_rescore
    from vdetlib_tpu.video.track import track_from_det

    tmp = None
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
    try:
        vid_proto, box_proto, frames_u8, rois, roi_mask, counts = build_inputs(
            dd, root
        )
        det_o, mgp_o, trk_o, res_o, link_o = _staged_opts(cd)

        # ---- staged (wire-compatible) chain -------------------------------
        det_proto = det_vid(
            models["det_model"], models["det_params"], vid_proto, box_proto, det_o
        )
        cur = mgp_stage(vid_proto, det_proto, opts=mgp_o, frames_u8=frames_u8)
        trk = track_from_det(
            models["trk_model"], models["trk_params"], vid_proto, cur,
            models["trk_cfg"], trk_o, frames_u8=frames_u8,
        )
        _, cur = tubelet_rescore(vid_proto, cur, trk, res_o)
        staged_det, staged_tub = seq_nms_video(vid_proto, cur, link_o)

        # ---- fused single-jit program (padded tail + roi masks) -----------
        pipe = make_fused_pipeline(
            models["det_model"], models["trk_model"], models["trk_cfg"],
            _fused_config(cd),
        )
        frames_p, rois_p, t_valid = pad_snippet(frames_u8, rois, bucket=T_PAD)
        mask_p = np.zeros(rois_p.shape[:2], bool)
        mask_p[: roi_mask.shape[0]] = roi_mask
        out = pipe(
            models["det_params"], models["trk_params"],
            jnp.asarray(frames_p), jnp.asarray(rois_p),
            t_valid, jnp.asarray(mask_p),
        )
        # trim padded tail exactly as pipeline/fused_runner._to_protos does
        T = dd.t_real
        out = out._replace(
            det_boxes=np.asarray(out.det_boxes)[:T],
            det_scores=np.asarray(out.det_scores)[:T],
            det_mask=np.asarray(out.det_mask)[:T],
            final_scores=np.asarray(out.final_scores)[:, :T],
            path_ids=np.asarray(out.path_ids)[:, :T],
        )
        fids = [f["frame"] for f in vid_proto["frames"]]
        fused_det, fused_tub = fused_to_protos(out, fids, vid_proto["video"])

        mismatches = compare_det_protos(staged_det, fused_det)
        mismatches += compare_tubelets(staged_tub, fused_tub)
        if int(out.n_tracks) != len(trk["tracks"]):
            mismatches.append(
                f"n_tracks {int(out.n_tracks)} vs staged {len(trk['tracks'])}"
            )

        # ---- variation descriptors (what did this draw actually exercise?)
        layouts = {}
        for d in det_proto["detections"]:
            layouts.setdefault(d["frame"], []).append(
                tuple(sc["class_index"] for sc in d["scores"])
            )
        layout_sigs = {f: tuple(v) for f, v in layouts.items()}
        descriptors = dict(
            slot_layout_div=len(set(layout_sigs.values())),
            roi_count_div=len(set(int(c) for c in counts)),
            padded_tail=bool(dd.t_real < T_PAD),
            tier=dd.tier,
            n_post_detect=sum(len(d["scores"]) for d in det_proto["detections"]),
            n_final_dets=len(staged_det["detections"]),
            n_tracks=len(trk["tracks"]),
            n_tubelets=len(staged_tub["tracks"]),
            tubelet_boxes=cd.tubelet_boxes,
            min_matched_frac_on=cd.min_matched_frac > 0,
            mgp_window=cd.mgp_window,
            boost=cd.boost,
            bg_decay_on=cd.bg_decay < 1.0,
            snap_on=cd.snap_weight > 0.0,
            stat_floor_on=cd.stat_floor > 0,
        )
        return dict(
            ok=not mismatches,
            mismatches=mismatches[:20],
            descriptors=descriptors,
            cfg=asdict(cd),
            data=asdict(dd),
        )
    finally:
        if tmp is not None:
            tmp.cleanup()


def corpus_coverage(reports: list) -> dict:
    """Corpus-level variation telemetry: which regimes did the draws cover?

    The CI test asserts each of these is True — the precondition-asserting
    pattern from the round-3 MGP-bug lesson, applied to the whole corpus.
    """
    ds = [r["descriptors"] for r in reports]
    return dict(
        any_layout_varies=any(d["slot_layout_div"] > 1 for d in ds),
        any_roi_counts_vary=any(d["roi_count_div"] > 1 for d in ds),
        any_padded_tail=any(d["padded_tail"] for d in ds),
        any_hard_tier=any(d["tier"] == "hard" for d in ds),
        any_easy_tier=any(d["tier"] == "easy" for d in ds),
        any_tubelet_boxes=any(d["tubelet_boxes"] for d in ds),
        any_matched_frac_gate=any(d["min_matched_frac_on"] for d in ds),
        any_mgp_window_2=any(d["mgp_window"] == 2 for d in ds),
        any_boost_mean=any(d["boost"] == "mean" for d in ds),
        any_bg_decay=any(d["bg_decay_on"] for d in ds),
        any_snap=any(d["snap_on"] for d in ds),
        any_snap_off=any(not d["snap_on"] for d in ds),
        any_stat_floor=any(d["stat_floor_on"] for d in ds),
        most_cases_nonempty=(
            sum(d["n_final_dets"] > 0 for d in ds) >= max(1, (2 * len(ds)) // 3)
        ),
        any_tracks=any(d["n_tracks"] > 0 for d in ds),
    )


# ---------------------------------------------------------------------------
# Streaming engine: chunked-vs-unchunked agreement under random draws.
# Exactness is impossible by design (causal bwd-hop at chunk tails, finite
# backtrack window — video/stream.py module doc), so this asserts the same
# documented agreement bounds as tests/test_stream.py, across random regimes.
# ---------------------------------------------------------------------------

def run_stream_agreement_case(models: dict, seed: int, chunk: int = 8) -> dict:
    import numpy as np

    from vdetlib_tpu.data.synth import SynthConfig, hard_config, make_video
    from vdetlib_tpu.video.stream import StreamOptions, stream_video

    rng = np.random.default_rng(seed)
    T = 24
    tier_hard = bool(rng.random() < 0.5)
    base = dict(
        num_frames=T, height=HW[0], width=HW[1], num_classes=C,
        seed=seed, max_speed=2.0, num_objects=2,
    )
    cfg = hard_config(**base) if tier_hard else SynthConfig(
        class_coded_appearance=True, **base
    )
    sv = make_video(cfg, video=f"stream{seed:05d}")
    Rr = R
    rois = np.zeros((T, Rr, 4), np.float32)
    K = sv.gt_boxes.shape[0]
    hi = np.array([HW[1] - 1, HW[0] - 1, HW[1] - 1, HW[0] - 1], np.float32)
    for t in range(T):
        n = 0
        for k in range(K):
            for _ in range(3):
                if n < Rr:
                    rois[t, n] = np.clip(sv.gt_boxes[k, t] + rng.normal(0, 2, 4), 0, hi)
                    n += 1
        while n < Rr:
            x1, y1 = rng.uniform(0, HW[1] - 20), rng.uniform(0, HW[0] - 20)
            rois[t, n] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
            n += 1
    rois[..., 2] = np.maximum(rois[..., 2], rois[..., 0] + 1.0)
    rois[..., 3] = np.maximum(rois[..., 3], rois[..., 1] + 1.0)

    def run(ch, engine="host"):
        def chunks():
            for s in range(0, T, ch):
                yield sv.frames[s : s + ch]

        opts = StreamOptions(
            engine=engine, chunk=ch, max_rois=Rr, num_classes=C,
            track_slots=6, seed_thresh=0.2, conf_thresh=0.2, max_paths=20,
        )
        return stream_video(
            models["det_model"], models["det_params"], models["trk_model"],
            models["trk_params"], models["trk_cfg"], chunks(), rois, opts,
        )

    big = run(T)
    small = run(chunk)
    keep_agree = float((big["keep"] == small["keep"]).mean())
    b_live = big["seq_scores"] > 0
    s_live = small["seq_scores"] > 0
    union = int((b_live | s_live).sum())
    live_iou = float((b_live & s_live).sum() / union) if union else 1.0

    # fused-vs-host engine parity at the same chunking: BIT-EXACT — both
    # engines execute the same compiled subprograms for every
    # tracker-affecting computation, and the NCC rollout's chaos means any
    # nonzero diff grows to pixels, so exactness is the only stable contract
    # (tests/test_stream.py::test_fused_engine_matches_host).
    fused = run(chunk, engine="fused")
    engines_exact = bool(
        (fused["keep"] == small["keep"]).all()
        and (fused["boxes"] == small["boxes"]).all()
        and (fused["scores"] == small["scores"]).all()
        and (fused["path_ids"] == small["path_ids"]).all()
        and (fused["seq_scores"] == small["seq_scores"]).all()
    )
    tracks_ok = set(fused["tracks"]) == set(small["tracks"])
    seg_box_maxdiff = 0.0
    if tracks_ok:
        for tid, hseg in small["tracks"].items():
            fseg = fused["tracks"][tid]
            if [t for t, _, _ in fseg] != [t for t, _, _ in hseg]:
                tracks_ok = False
                break
            if hseg:
                seg_box_maxdiff = max(
                    seg_box_maxdiff,
                    float(
                        np.abs(
                            np.stack([b for _, b, _ in fseg])
                            - np.stack([b for _, b, _ in hseg])
                        ).max()
                    ),
                )
    engine_parity = engines_exact and tracks_ok and seg_box_maxdiff == 0.0

    ok = keep_agree > 0.95 and live_iou > 0.5 and engine_parity
    return dict(
        ok=ok, seed=seed, chunk=chunk, tier="hard" if tier_hard else "easy",
        keep_agree=keep_agree, live_iou=live_iou, union=union,
        engine_parity=engine_parity, engines_exact=engines_exact,
        seg_box_maxdiff=seg_box_maxdiff,
    )
