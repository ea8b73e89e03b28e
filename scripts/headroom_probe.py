#!/usr/bin/env python
"""Hard-tier accuracy-headroom map (VERDICT r3 item #3).

Bounds what the temporal stages (MGP -> track -> rescore -> seq-NMS) can
recover, and attributes the remaining gap of the real pipeline between
detector recall, tracker/identity quality, and the rescore statistic:

1. ORACLE-DETECTOR LADDER: feed the temporal stages GT-derived detections
   (data/synth.py::det_proto_from_gt — occlusion-blind like a real per-frame
   detector, jittered boxes, score noise, random distractors) at several
   degradation levels (extra blind windows / i.i.d. dropout). For each
   level, measure (a) frame-NMS-only mAP and (b) full-temporal-stages mAP;
   (b) - (a) is the stages' recovery power when detector errors are the
   ONLY problem.
2. PERFECT-TRACKER PROBE: real detections + real MGP, but the rescoring
   stage consumes the GROUND-TRUTH tracks (annot_proto) instead of the
   visual tracker's output — the ceiling of the tracker+rescore subsystem
   with the real detector, isolating tracker/identity error from detector
   recall.

Videos are reconstructed in-process from the recorded provenance of
/tmp/dshard (hard tier, seed 500+i; RESULTS.md "Round-4 yardstick") and
VERIFIED against the on-disk annot protos before any measurement. Reuses
the staged TPU run's detect.json/mgp.json for the perfect-tracker probe
when present (same files the yardstick was computed from).

CPU-runnable (keeps the chip free):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        VDETLIB_TPU_FLOW_UNROLL=4 \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        python scripts/headroom_probe.py --out /tmp/headroom
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/tmp/dshard"
STAGED = "/tmp/hw_R4_staged_confirm"
N_VIDEOS = 10
SEED0 = 500
HW = (240, 320)
NUM_CLASSES = 6
MAX_ROIS = 48


def reconstruct_videos():
    """Rebuild each dshard SynthVideo in-process; verify against disk GT."""
    from vdetlib_tpu.data.synth import hard_config, make_video
    from vdetlib_tpu.protos import proto_load

    svs, vids, annots = [], [], []
    for i in range(N_VIDEOS):
        name = f"synth{i:03d}"
        cfg = hard_config(
            num_frames=30, height=HW[0], width=HW[1], num_classes=NUM_CLASSES,
            proposals_per_frame=MAX_ROIS, seed=SEED0 + i,
        )
        sv = make_video(cfg, video=name)
        annot = proto_load(os.path.join(DATA, f"{name}.annot.json"))
        # provenance check: reconstructed GT must match the on-disk annots
        disk_first = annot["annotations"][0]["track"][0]["bbox"]
        k0 = None
        for k in range(sv.gt_boxes.shape[0]):
            if sv.gt_visible[k, 0] and np.allclose(
                sv.gt_boxes[k, 0], disk_first, atol=1e-4
            ):
                k0 = k
                break
        assert k0 is not None, (
            f"{name}: reconstructed GT does not match {DATA} — "
            "provenance drift; regenerate or fix SEED0"
        )
        svs.append(sv)
        vids.append(proto_load(os.path.join(DATA, f"{name}.vid.json")))
        annots.append(annot)
    return svs, vids, annots


def r4_pipeline_cfg(stages, trk_cfg=None):
    """Mirror cli/pipeline_tool.py's R4 config exactly (bg_decay 0.7,
    boost mean, otherwise CLI defaults at hw/classes/rois of the yardstick)."""
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
            window=1, num_classes=NUM_CLASSES, image_hw=HW, flow_preset="fastest"
        ),
        track=TrackOptions(
            max_tracks=16, image_hw=HW, anchor_thresh=0.3, conf_thresh=0.5
        ),
        tracker_cfg=trk_cfg,
        rescore=RescoreOptions(
            num_classes=NUM_CLASSES, boost="mean", bg_decay=0.7, top_ratio=0.5
        ),
        link=LinkOptions(num_classes=NUM_CLASSES),
        stages=tuple(stages),
    )


def eval_pairs(pairs):
    from vdetlib_tpu.evaluation.vid_map import vid_map

    m, _ = vid_map(pairs)
    return float(m)


def frame_nms_map(det_protos, vids, annots):
    from vdetlib_tpu.video.frame_nms import frame_nms

    pairs = []
    for dp, vid, an in zip(det_protos, vids, annots):
        pairs.append((frame_nms(vid, dp, thresh=0.3, backend="host"), an))
    return eval_pairs(pairs)


def temporal_map(det_protos, vids, annots, models, workroot, tag):
    """Injected-det full temporal stages via the staged runner (resume-safe)."""
    from vdetlib_tpu.pipeline.runner import run_video
    from vdetlib_tpu.protos import proto_load

    cfg = models["cfg_temporal"]
    pairs = []
    for dp, vid, an in zip(det_protos, vids, annots):
        wd = os.path.join(workroot, tag)
        paths = run_video(wd, vid, None, models["models"], cfg, det_proto=dp)
        pairs.append((proto_load(paths["result"]), an))
    return eval_pairs(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/headroom")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)

    from vdetlib_tpu.data.synth import det_proto_from_gt
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.runner import Models
    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.video.link import seq_nms_video
    from vdetlib_tpu.video.rescore import tubelet_rescore

    svs, vids, annots = reconstruct_videos()
    print("provenance check passed: reconstructed GT matches /tmp/dshard")

    det_cfg = detector_preset("small", num_classes=NUM_CLASSES)
    det_model, det_params = init_detector(det_cfg, HW, MAX_ROIS, seed=0)
    trk_cfg = TrackerConfig()
    from vdetlib_tpu.video.track import init_tracker

    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    cfg = r4_pipeline_cfg(("mgp", "track", "rescore", "seq_nms"), trk_cfg)
    models = dict(
        models=Models(det_model, det_params, trk_model, trk_params),
        cfg_temporal=cfg,
    )

    results = {}

    # ---- 1. oracle-detector ladder ------------------------------------
    ladder = [
        ("oracle", dict()),  # occlusion-blind only (built into the oracle)
        ("oracle+2win", dict(dropout_windows=2)),
        ("oracle+4win", dict(dropout_windows=4)),
        ("oracle+drop.3", dict(drop_rate=0.3)),
    ]
    for tag, kw in ladder:
        dets = [det_proto_from_gt(sv, **kw) for sv in svs]
        a = frame_nms_map(dets, vids, annots)
        b = temporal_map(dets, vids, annots, models, args.out, tag)
        results[tag] = dict(frame_nms=a, temporal=b, recovery=b - a)
        print(f"{tag}: frame-NMS {a:.4f} -> temporal {b:.4f} "
              f"(recovery {b - a:+.4f})", flush=True)

    # ---- 2. perfect-tracker probe (GT tracks into rescore) -------------
    from vdetlib_tpu.video.link import LinkOptions
    from vdetlib_tpu.video.rescore import RescoreOptions

    res_o = RescoreOptions(
        num_classes=NUM_CLASSES, boost="mean", bg_decay=0.7, top_ratio=0.5
    )
    link_o = LinkOptions(num_classes=NUM_CLASSES)
    pairs = []
    for i, (vid, an) in enumerate(zip(vids, annots)):
        name = vid["video"]
        mgp_path = os.path.join(STAGED, name, "mgp.json")
        assert os.path.exists(mgp_path), (
            f"{mgp_path} missing — run the staged yardstick pipeline first "
            "(RESULTS.md Round-4 yardstick)"
        )
        cur = proto_load(mgp_path)
        gt_tracks = {
            "video": name,
            "method": "gt_oracle",
            "tracks": [a["track"] for a in an["annotations"]],
        }
        _, cur = tubelet_rescore(vid, cur, gt_tracks, res_o)
        final, _ = seq_nms_video(vid, cur, link_o)
        pairs.append((final, an))
    m = eval_pairs(pairs)
    results["real_dets+gt_tracks"] = dict(temporal=m)
    print(f"real dets + GT tracks (perfect tracker): {m:.4f}", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
