#!/usr/bin/env python
"""Flicker-tier knob calibration (VERDICT r4 item 8).

The opt-in rescore/track knob family (stat_floor, min_matched_frac,
snapping, tubelet_boxes) measured neutral-to-negative on the HARD tier,
whose losses are occlusion-shaped. Their design regime is different:
VISIBLE objects + an unreliable detector — per-frame i.i.d. dropout on
true objects (the headroom ladder's +22.4-recovery row) plus short
CONFIDENT false-positive bursts on class-colored pixel distractors. This
script builds that tier and calibrates the knobs in it, settling VERDICT
r4 item 8: either a knob earns a documented home regime or the family is
declared closed.

Tier: hard_config(num_occluders=0) — flickering class-colored distractors
and camera pan, but no occluder bars, so every GT object stays visible —
with injected detections det_proto_from_gt(drop_rate=0.3,
distractor_fp_rate=0.85): 30% i.i.d. misses + high-score (0.45-0.9) FP
detections riding each ON-window of each pixel distractor. The tracker
runs on the real pixels, so FP-seeded tracks have genuine NCC support
while the distractor is lit and lose it when it flickers off — exactly
the short-confident-track signature stat_floor/min_matched_frac target.

CPU-runnable (keeps the chip free):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        python scripts/flicker_tier.py --out /tmp/flicker
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIDEOS = 10
SEED0 = 900
HW = (240, 320)
NUM_CLASSES = 6
MAX_ROIS = 48
FRAMES = 30


def build_tier(root):
    from vdetlib_tpu.data.synth import (
        annot_proto, det_proto_from_gt, hard_config, make_video, write_frames,
    )

    os.makedirs(root, exist_ok=True)
    items = []
    for i in range(N_VIDEOS):
        cfg = hard_config(
            num_frames=FRAMES, height=HW[0], width=HW[1],
            num_classes=NUM_CLASSES, proposals_per_frame=MAX_ROIS,
            seed=SEED0 + i, num_occluders=0,
        )
        sv = make_video(cfg, video=f"flick{i:03d}")
        assert sv.gt_visible.mean() > 0.9, "tier must keep objects visible"
        vid = write_frames(sv, os.path.join(root, "frames"))
        det = det_proto_from_gt(sv, drop_rate=0.3, distractor_fp_rate=0.85)
        items.append((vid, det, annot_proto(sv)))
    return items


def pipeline_cfg(track_kw=None, rescore_kw=None, stages=None):
    from vdetlib_tpu.pipeline.runner import PipelineConfig
    from vdetlib_tpu.video.detect import DetectOptions
    from vdetlib_tpu.video.link import LinkOptions
    from vdetlib_tpu.video.mgp import MGPOptions
    from vdetlib_tpu.video.rescore import RescoreOptions
    from vdetlib_tpu.video.track import TrackOptions

    return PipelineConfig(
        detect=DetectOptions(
            batch_size=8, max_rois=MAX_ROIS, image_hw=HW, score_thresh=0.05
        ),
        mgp=MGPOptions(
            window=1, num_classes=NUM_CLASSES, image_hw=HW,
            flow_preset="fastest",
        ),
        track=TrackOptions(
            max_tracks=16, image_hw=HW, anchor_thresh=0.3, conf_thresh=0.5,
            **(track_kw or {}),
        ),
        rescore=RescoreOptions(
            num_classes=NUM_CLASSES, boost="mean", bg_decay=0.7,
            top_ratio=0.5, **(rescore_kw or {}),
        ),
        link=LinkOptions(num_classes=NUM_CLASSES),
        stages=tuple(stages or ("mgp", "track", "rescore", "seq_nms")),
    )


NO_LINK = ("mgp", "track", "rescore")
CONFIGS = {
    "base": {},
    "floor3": dict(rescore_kw=dict(stat_floor=3)),
    "floor5": dict(rescore_kw=dict(stat_floor=5)),
    "mmf03": dict(rescore_kw=dict(min_matched_frac=0.3)),
    "mmf05": dict(rescore_kw=dict(min_matched_frac=0.5)),
    "snap05": dict(track_kw=dict(snap_weight=0.5)),
    "tbox": dict(rescore_kw=dict(tubelet_boxes=True)),
    "floor3_mmf03": dict(
        rescore_kw=dict(stat_floor=3, min_matched_frac=0.3)
    ),
    "nolink_base": dict(stages=NO_LINK),
    "nolink_floor3": dict(rescore_kw=dict(stat_floor=3), stages=NO_LINK),
    "nolink_floor5": dict(rescore_kw=dict(stat_floor=5), stages=NO_LINK),
    "nolink_mmf05": dict(
        rescore_kw=dict(min_matched_frac=0.5), stages=NO_LINK
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/flicker")
    ap.add_argument("--configs", default=None)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)

    from vdetlib_tpu.evaluation.vid_map import vid_map
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.runner import Models, run_video
    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.video.frame_nms import frame_nms
    from vdetlib_tpu.video.track import init_tracker

    items = build_tier(os.path.join(args.out, "data"))
    # precondition (CLAUDE.md blind-spot rule): the tier must actually
    # contain confident FALSE positives (score >= 0.45, max IoU vs any
    # GT box at that frame < 0.3), or it cannot discriminate
    import numpy as np

    from vdetlib_tpu.utils.common import iou as iou_fn

    n_fp = 0
    for vid, det, an in items:
        gt_by_frame = {}
        for a in an["annotations"]:
            for b in a["track"]:
                gt_by_frame.setdefault(b["frame"], []).append(b["bbox"])
        for d in det["detections"]:
            if d["scores"][0]["score"] < 0.45:
                continue
            gts = gt_by_frame.get(d["frame"], [])
            if not gts or iou_fn(
                np.asarray([d["bbox"]], np.float32),
                np.asarray(gts, np.float32),
            ).max() < 0.3:
                n_fp += 1
    assert n_fp >= 10 * N_VIDEOS, (
        f"only {n_fp} confident FPs — tier cannot discriminate"
    )
    print(f"tier built: {len(items)} videos, {n_fp} confident FPs")

    det_cfg = detector_preset("small", num_classes=NUM_CLASSES)
    det_model, det_params = init_detector(det_cfg, HW, MAX_ROIS, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    models = Models(det_model, det_params, trk_model, trk_params)

    results = {}
    pairs = [
        (frame_nms(vid, det, thresh=0.3, backend="host"), an)
        for vid, det, an in items
    ]
    m, _ = vid_map(pairs)
    results["frame_nms"] = float(m)
    print(json.dumps({"config": "frame_nms", "mAP": round(float(m), 4)}),
          flush=True)

    names = args.configs.split(",") if args.configs else list(CONFIGS)
    for name in names:
        cfg = pipeline_cfg(**CONFIGS[name])
        wd = os.path.join(args.out, "work", name)
        shutil.rmtree(wd, ignore_errors=True)
        pairs = []
        for vid, det, an in items:
            paths = run_video(wd, vid, None, models, cfg, det_proto=det)
            pairs.append((proto_load(paths["result"]), an))
        m, _ = vid_map(pairs)
        results[name] = float(m)
        print(json.dumps({"config": name, "mAP": round(float(m), 4)}),
              flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
