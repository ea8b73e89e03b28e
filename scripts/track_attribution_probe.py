#!/usr/bin/env python
"""Attribute the perfect-tracker headroom (+6.7 mAP) to track error modes.

The round-4 headroom map (RESULTS.md, scripts/headroom_probe.py) bounded the
tracker+rescore subsystem: real tracks 0.5383 vs GT tracks 0.6049 into the
same rescore stage. That bound conflates THREE tracker error modes; this
probe separates them with oracle-edited versions of the REAL tracks:

  purge      — drop whole tracks whose lifetime-mean best-GT IoU < thr
               (distractor/background-latched tracks; GT has no such track)
  truncate   — per-frame mask matched tracks where IoU to their assigned GT
               object < thr (template drift / identity switches; GT boxes
               never drift)
  purge+trunc— both edits
  +coverage  — purge+trunc plus GT tracks for GT objects NO real track was
               assigned to (seeding/coverage misses)
  gt         — pure GT tracks (headroom_probe's perfect-tracker ceiling,
               re-measured here as the consistency anchor)

Each variant feeds the UNMODIFIED rescore + seq-NMS stages (R4 config,
bg_decay 0.7, boost mean) on the staged run's mgp.json detections, so the
deltas are pure track-set effects. GT boxes come from the in-process
provenance-checked reconstruction (occluded frames keep their GT box — a
track bridging an occlusion correctly is NOT truncated).

Inputs: /tmp/abl_base (staged R4 base run: mgp.json + track.json per video,
written by scripts/ablate_knobs_r4.py) and /tmp/dshard. CPU-runnable:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        VDETLIB_TPU_FLOW_UNROLL=4 \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        PYTHONPATH=/root/repo python scripts/track_attribution_probe.py
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGED = "/tmp/abl_base"
MATCH_THR = 0.3  # track-to-GT assignment / per-frame drift threshold


def _load_headroom():
    spec = importlib.util.spec_from_file_location(
        "headroom_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "headroom_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _iou_kt(trk, gt):
    """IoU between (K,T,4) track boxes and (G,T,4) GT boxes → (K,G,T)."""
    from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET as off

    a, b = trk[:, None], gt[None]
    ix1 = np.maximum(a[..., 0], b[..., 0])
    iy1 = np.maximum(a[..., 1], b[..., 1])
    ix2 = np.minimum(a[..., 2], b[..., 2])
    iy2 = np.minimum(a[..., 3], b[..., 3])
    iw = np.maximum(ix2 - ix1 + off, 0.0)
    ih = np.maximum(iy2 - iy1 + off, 0.0)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + off) * (a[..., 3] - a[..., 1] + off)
    area_b = (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)


def edit_tracks(trk_boxes, trk_mask, gt_boxes, thr=MATCH_THR):
    """Oracle edits of a real track set against GT.

    Returns dict of per-variant (mask (K,T), plus assignment diagnostics).
    """
    K, T = trk_mask.shape
    G = gt_boxes.shape[0]
    if K == 0 or G == 0:
        z = trk_mask.copy()
        return dict(
            purge=z, truncate=z, purge_trunc=z,
            assigned=np.zeros((G,), bool), g_star=np.full((K,), -1),
            quality=np.zeros((K,),), matched=np.zeros((K,), bool),
        )
    iou = _iou_kt(trk_boxes, gt_boxes) * trk_mask[:, None, :]  # (K,G,T)
    per_gt = iou.sum(axis=2)  # (K, G)
    g_star = per_gt.argmax(axis=1)  # (K,)
    live = np.maximum(trk_mask.sum(axis=1), 1)
    iou_star = iou[np.arange(K), g_star]  # (K, T)
    quality = iou_star.sum(axis=1) / live  # lifetime-mean IoU to assigned GT
    matched = quality >= thr  # non-distractor tracks

    purge = trk_mask & matched[:, None]
    # per-frame drift mask, only for matched tracks; unmatched left intact
    frame_ok = iou_star >= thr
    truncate = np.where(matched[:, None], trk_mask & frame_ok, trk_mask)
    purge_trunc = trk_mask & matched[:, None] & frame_ok

    assigned = np.zeros((G,), bool)
    for k in range(K):
        if matched[k]:
            assigned[g_star[k]] = True
    return dict(
        purge=purge, truncate=truncate, purge_trunc=purge_trunc,
        assigned=assigned, g_star=g_star, quality=quality, matched=matched,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thr", type=float, default=MATCH_THR)
    ap.add_argument("--no_link", action="store_true",
                    help="also measure the rescore-only (no seq-NMS) regime")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    H = _load_headroom()

    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.protos.accessors import frame_ids as get_frame_ids
    from vdetlib_tpu.protos.arrays import (
        arrays_to_track_proto,
        track_proto_to_arrays,
    )
    from vdetlib_tpu.video.link import LinkOptions, seq_nms_video
    from vdetlib_tpu.video.rescore import RescoreOptions, tubelet_rescore

    svs, vids, annots = H.reconstruct_videos()
    print("provenance check passed", flush=True)

    res_o = RescoreOptions(
        num_classes=H.NUM_CLASSES, boost="mean", bg_decay=0.7, top_ratio=0.5
    )
    link_o = LinkOptions(num_classes=H.NUM_CLASSES)

    variants = ["real", "purge", "truncate", "purge_trunc", "coverage", "gt"]
    pairs = {v: [] for v in variants}
    pairs_nl = {v: [] for v in variants}
    diag = dict(n_tracks=0, n_purged=0, n_frames_trunc=0, n_gt_filled=0,
                n_gt_total=0)

    for sv, vid, an in zip(svs, vids, annots):
        name = vid["video"]
        fids = get_frame_ids(vid)
        mgp = proto_load(os.path.join(STAGED, name, "mgp.json"))
        trk = proto_load(os.path.join(STAGED, name, "track.json"))
        trk_boxes, trk_scores, trk_mask = track_proto_to_arrays(trk, fids)
        gt_boxes = sv.gt_boxes  # (G, T, 4), defined through occlusions
        gt_vis = sv.gt_visible
        e = edit_tracks(trk_boxes, trk_mask, gt_boxes, thr=args.thr)

        diag["n_tracks"] += int(trk_mask.shape[0])
        diag["n_purged"] += int((~e["matched"]).sum())
        diag["n_frames_trunc"] += int(
            (trk_mask & ~e["truncate"]).sum()
        )
        diag["n_gt_filled"] += int((~e["assigned"]).sum())
        diag["n_gt_total"] += int(gt_boxes.shape[0])

        def tp(mask, extra_gt=False):
            boxes, scores, m = trk_boxes, trk_scores, mask
            if extra_gt:
                fill = ~e["assigned"]
                if fill.any():
                    boxes = np.concatenate([boxes, gt_boxes[fill]], axis=0)
                    scores = np.concatenate(
                        [scores, np.ones(gt_boxes[fill].shape[:2], np.float32)],
                        axis=0,
                    )
                    m = np.concatenate([m, gt_vis[fill]], axis=0)
            return arrays_to_track_proto(boxes, scores, m, fids, name, "oracle_edit")

        gt_tp = {
            "video": name, "method": "gt_oracle",
            "tracks": [a["track"] for a in an["annotations"]],
        }
        track_sets = dict(
            real=tp(trk_mask),
            purge=tp(e["purge"]),
            truncate=tp(e["truncate"]),
            purge_trunc=tp(e["purge_trunc"]),
            coverage=tp(e["purge_trunc"], extra_gt=True),
            gt=gt_tp,
        )
        for v, tset in track_sets.items():
            _, cur = tubelet_rescore(vid, mgp, tset, res_o)
            if args.no_link:
                pairs_nl[v].append((cur, an))
            final, _ = seq_nms_video(vid, cur, link_o)
            pairs[v].append((final, an))

    results = {}
    for v in variants:
        row = dict(full=H.eval_pairs(pairs[v]))
        if args.no_link:
            row["no_link"] = H.eval_pairs(pairs_nl[v])
        results[v] = row
        print(f"{v:12s} full={row['full']:.4f}"
              + (f" no_link={row['no_link']:.4f}" if args.no_link else ""),
              flush=True)
    results["diag"] = diag
    print("diag:", json.dumps(diag), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
