"""Fused-engine sweep — the staged pipeline at fused-program speed.

The staged runner (pipeline/runner.py) crosses the disk boundary at every
stage; at ~30-frame videos that caps throughput near 20 frames/sec/chip.
Because the fused program is PARITY-LOCKED to the staged stages
(tests/test_fused_parity.py), a sweep can instead run each video as ONE
device dispatch and emit the same wire-compatible final protos:

  decode (threaded, overlapped with the previous group's compute)
  → pad to a T bucket (one compiled executable per (group, bucket))
  → fused detect→MGP→track→rescore→seq-NMS dispatch — optionally vmapped
    over a GROUP of same-bucket videos (group_size > 1 amortizes the fixed
    per-dispatch cost, 1608 → 1837 fps at 4 snippets/dispatch on the bench
    workload, at the price of bf16-reassociation-level divergence from the
    single-video executable; default 1 keeps strict parity)
  → final det_proto + tubelet track_proto per video, written atomically.

Resume-by-existence is preserved at video granularity (the stage-level
boundaries collapse into the device program, so per-stage resume does not
apply — use the staged engine when stage outputs are needed).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.loader import FrameLoader
from vdetlib_tpu.pipeline.fused import (
    FusedConfig,
    fused_to_protos,
    make_fused_pipeline,
    pad_snippet,
)
from vdetlib_tpu.protos import proto_dump, proto_exists
from vdetlib_tpu.protos.arrays import box_proto_to_arrays
from vdetlib_tpu.utils.log import StageMetrics, get_logger

log = get_logger("pipeline.fused")


def fused_config_from_pipeline(cfg) -> FusedConfig:
    """Map a staged PipelineConfig onto the matched FusedConfig.

    The fused program has ONE output budget where the staged path has two
    (rescore.max_boxes / link.max_boxes) — they must agree for parity, and
    the link budget wins.
    """
    if cfg.rescore.max_boxes != cfg.link.max_boxes:
        log.warning(
            "fused engine uses one output budget: link.max_boxes=%d "
            "(rescore.max_boxes=%d ignored)",
            cfg.link.max_boxes, cfg.rescore.max_boxes,
        )
    return FusedConfig(
        image_hw=tuple(cfg.detect.image_hw),
        detect_batch=cfg.detect.batch_size,
        feat_batch=cfg.track.batch_size,
        score_thresh=cfg.detect.score_thresh,
        mgp_window=cfg.mgp.window,
        mgp_decay=cfg.mgp.score_decay,
        nms_thresh=cfg.mgp.nms_thresh,
        det_budget=cfg.mgp.max_boxes,
        out_budget=cfg.link.max_boxes,
        max_tracks=cfg.track.max_tracks,
        anchors_per_round=cfg.track.anchors_per_round,
        anchor_thresh=cfg.track.anchor_thresh,
        track_conf=cfg.track.conf_thresh,
        cover_thresh=cfg.track.cover_thresh,
        snap_weight=cfg.track.snap_weight,
        snap_iou=cfg.track.snap_iou,
        track_stride=cfg.track.frame_stride,
        rescore_match=cfg.rescore.match_thresh,
        top_ratio=cfg.rescore.top_ratio,
        boost=cfg.rescore.boost,
        bg_decay=cfg.rescore.bg_decay,
        min_matched_frac=cfg.rescore.min_matched_frac,
        stat_floor=cfg.rescore.stat_floor,
        link_thresh=cfg.link.link_thresh,
        suppress_thresh=cfg.link.suppress_thresh,
        max_paths=cfg.link.max_paths,
        link_rescore=cfg.link.rescore,
        tubelet_boxes=cfg.rescore.tubelet_boxes,
        flow_preset=cfg.mgp.flow_preset,
        flow_levels=cfg.mgp.flow_levels,
        flow_search=cfg.mgp.flow_search,
    )


class FusedEngine:
    """Compiled fused pipeline + per-video decode/convert plumbing."""

    def __init__(self, models, cfg, bucket: int = 32, group_size: int = 1):
        self.models = models
        self.fcfg = fused_config_from_pipeline(cfg)
        self.max_rois = cfg.detect.max_rois
        self.min_score = cfg.link.min_score
        # the padded T must be a multiple of the detect batch
        b = self.fcfg.detect_batch
        self.bucket = ((max(bucket, b) + b - 1) // b) * b
        self.pipe = make_fused_pipeline(
            models.detector, models.tracker, cfg.tracker_cfg, self.fcfg
        )
        # videos per dispatch: amortizes the fixed per-dispatch cost over a
        # group of same-bucket snippets (measured on the bench workload:
        # 1608 → 1837 fps from V=1 → V=4; V=8 regresses — RESULTS.md).
        # OPT-IN (default 1): the vmapped program reassociates the bf16 conv
        # math, which can flip near-tied NMS orderings / threshold crossings
        # vs the single-video executable — group_size=1 keeps the strict
        # staged-parity contract, >1 trades it for dispatch amortization.
        self.group_size = max(1, group_size)
        self._vpipe = jax.jit(
            jax.vmap(self.pipe, in_axes=(None, None, 0, 0, 0, 0))
        )

    def load(self, vid_proto: dict, box_proto: Optional[dict]):
        """Host side: decode frames + pack rois (runs on a prefetch thread)."""
        H, W = self.fcfg.image_hw
        fids = [f["frame"] for f in vid_proto["frames"]]
        loader = FrameLoader(vid_proto, target_hw=(H, W))
        frames, scales = [], []
        for _, img, scale in loader.iter_frames():
            frames.append(img)
            scales.append(scale)
        loader.close()
        frames = np.stack(frames)
        sy, sx = scales[0]
        if any(s != (sy, sx) for s in scales):
            raise ValueError(
                f"{vid_proto['video']}: fused engine needs a constant frame "
                f"size within a video (got varying decode scales)"
            )
        if box_proto is None:
            raise ValueError(
                f"{vid_proto['video']}: fused engine needs proposals "
                f"(box_proto); run the staged engine for proposal-free flows"
            )
        rois, roi_mask = box_proto_to_arrays(box_proto, fids, self.max_rois)
        rois = rois * np.array([sx, sy, sx, sy], np.float32)
        frames_p, rois_p, t_valid = pad_snippet(frames, rois, self.bucket)
        Tp = frames_p.shape[0]
        mask_p = np.zeros((Tp, self.max_rois), bool)
        mask_p[: roi_mask.shape[0]] = roi_mask
        inv = np.array([1 / sx, 1 / sy, 1 / sx, 1 / sy], np.float32)
        # upload from the prefetch thread so video v+1's host→device transfer
        # (the sweep's bottleneck on slow links) overlaps video v's compute
        return (
            fids,
            jax.device_put(frames_p),
            jax.device_put(rois_p),
            jax.device_put(mask_p),
            t_valid,
            inv,
        )

    def _to_protos(self, vid_proto, fids, inv, out):
        # back to native pixel space, trimmed to real frames
        T = len(fids)
        out = out._replace(
            det_boxes=np.asarray(out.det_boxes)[:T] * inv,
            det_scores=np.asarray(out.det_scores)[:T],
            det_mask=np.asarray(out.det_mask)[:T],
            final_scores=np.asarray(out.final_scores)[:, :T],
            path_ids=np.asarray(out.path_ids)[:, :T],
        )
        return fused_to_protos(
            out, fids, vid_proto["video"], min_score=self.min_score
        )

    def run(self, vid_proto, loaded):
        """Device dispatch + proto conversion for one pre-loaded video."""
        fids, frames_p, rois_p, mask_p, t_valid, inv = loaded
        out = self.pipe(
            self.models.detector_params,
            self.models.tracker_params,
            frames_p,
            rois_p,
            t_valid,
            mask_p,
        )
        return self._to_protos(vid_proto, fids, inv, out)

    def run_group(self, vid_protos, loadeds):
        """ONE device dispatch for several same-bucket videos (vmap over the
        video axis); returns a list of (det_proto, tubelets) per video."""
        if len(loadeds) == 1:
            return [self.run(vid_protos[0], loadeds[0])]
        frames_v = jnp.stack([ld[1] for ld in loadeds])
        rois_v = jnp.stack([ld[2] for ld in loadeds])
        mask_v = jnp.stack([ld[3] for ld in loadeds])
        tv = jnp.asarray([ld[4] for ld in loadeds])
        out_v = self._vpipe(
            self.models.detector_params,
            self.models.tracker_params,
            frames_v,
            rois_v,
            tv,
            mask_v,
        )
        results = []
        for i, (vid_proto, ld) in enumerate(zip(vid_protos, loadeds)):
            out_i = jax.tree.map(lambda x: x[i], out_v)
            results.append(self._to_protos(vid_proto, ld[0], ld[5], out_i))
        return results


def run_videos_fused(
    workdir: str, video_inputs, models, cfg, group_size: int = 1,
    keep_going: bool = False,
) -> list[dict]:
    """Fused-engine counterpart of runner.run_videos (same I/O contract).

    Decode of the next group overlaps the current group's device compute
    (single prefetch thread); outputs are written atomically, and a video
    whose final proto exists is skipped (crash-resume at video granularity).
    ``group_size`` > 1 batches same-bucket videos into one dispatch (see
    FusedEngine — throughput vs strict single-video parity).
    """
    from vdetlib_tpu.pipeline.runner import dump_config

    metrics = StageMetrics("pipeline_fused")
    dump_config(workdir, cfg)
    engine = FusedEngine(models, cfg, group_size=group_size)
    results = []
    n_frames = 0

    def paths_for(vid_proto):
        vdir = os.path.join(workdir, vid_proto["video"])
        return {
            "video": vid_proto["video"],
            "final": os.path.join(vdir, "final.json"),
            "tubelets": os.path.join(vdir, "tubelets.json"),
            "result": os.path.join(vdir, "final.json"),
        }

    todo = []
    for vid_proto, box_proto in video_inputs:
        p = paths_for(vid_proto)
        results.append(p)
        if proto_exists(p["final"]):
            log.info("skip %s (final exists)", vid_proto["video"])
            continue
        todo.append((vid_proto, box_proto, p))

    G = engine.group_size
    groups = [todo[i : i + G] for i in range(0, len(todo), G)]
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = None
        for gi, group in enumerate(groups):
            if futs is None:
                futs = [ex.submit(engine.load, v, b) for v, b, _ in group]
            loadeds = []
            kept_group = []
            for (v, b, p), f in zip(group, futs):
                try:
                    loadeds.append(f.result())
                    kept_group.append((v, b, p))
                except Exception as e:
                    if not keep_going:
                        raise
                    log.warning(
                        "fused %s FAILED to load (%s: %s) — continuing "
                        "(--keep_going)", v["video"], type(e).__name__, e,
                    )
                    p["error"] = f"{type(e).__name__}: {e}"
            group = kept_group
            futs = (
                [ex.submit(engine.load, v, b) for v, b, _ in groups[gi + 1]]
                if gi + 1 < len(groups)
                else None
            )
            # one dispatch per same-bucket run within the group (uniform
            # datasets share one bucket, so normally the whole group)
            start = 0
            while start < len(group):
                tp = loadeds[start][1].shape[0]
                end = start
                while end < len(group) and loadeds[end][1].shape[0] == tp:
                    end += 1
                vids = [g[0] for g in group[start:end]]
                try:
                    outs = engine.run_group(vids, loadeds[start:end])
                except Exception as e:
                    if not keep_going:
                        raise
                    for vid_proto, _, p in group[start:end]:
                        log.warning(
                            "fused %s FAILED (%s: %s) — continuing "
                            "(--keep_going)",
                            vid_proto["video"], type(e).__name__, e,
                        )
                        p["error"] = f"{type(e).__name__}: {e}"
                    start = end
                    continue
                for (vid_proto, _, p), ld, (det_proto, tubelets) in zip(
                    group[start:end], loadeds[start:end], outs
                ):
                    os.makedirs(os.path.dirname(p["final"]), exist_ok=True)
                    proto_dump(tubelets, p["tubelets"])
                    proto_dump(det_proto, p["final"])
                    n_frames += len(ld[0])
                    log.info(
                        "fused %s: %d frames, %d final dets, %d tubelets",
                        vid_proto["video"], len(ld[0]),
                        len(det_proto["detections"]), len(tubelets["tracks"]),
                    )
                start = end

    metrics.set("frames", n_frames)
    metrics.set("videos", len(todo))
    metrics.finish()
    return results
