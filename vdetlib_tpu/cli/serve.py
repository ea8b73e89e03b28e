"""Serving daemon — watch a directory for new videos, process continuously.

Production-serving counterpart of the batch ``pipeline`` tool: polls
``<data_dir>`` for ``NAME.vid.json`` (+ optional ``NAME.box.json``) whose
outputs don't exist yet, runs the staged pipeline on each, and writes results
under ``<workdir>/NAME/``. Safe to run several instances (even on several
hosts over a shared filesystem): stage outputs are written atomically and a
per-video ``.lock`` directory provides mutual exclusion; crashes resume at
the last completed stage (SURVEY.md §5.3).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import socket
import time


def try_lock(lock: str, ttl_sec: float = 3600.0) -> bool:
    """Acquire a per-video lock directory; reclaim crashed owners.

    A lock carries an ``owner.json`` (host, pid, timestamp). It is considered
    STALE — and reclaimed — when its owner process is dead (same host) or the
    lock is older than ``ttl_sec`` (any host; covers SIGKILL/OOM where the
    finally-block cleanup never ran). Reclaiming re-races through
    ``os.makedirs``, so exactly one contender wins.
    """
    meta = os.path.join(lock, "owner.json")
    try:
        os.makedirs(lock)  # atomic mutual exclusion
    except FileExistsError:
        stale = False
        try:
            with open(meta, "r", encoding="utf-8") as f:
                info = json.load(f)
            age = time.time() - float(info.get("time", 0))
            if age > ttl_sec:
                stale = True
            elif info.get("host") == socket.gethostname():
                try:
                    os.kill(int(info["pid"]), 0)
                except (OSError, ValueError):
                    stale = True  # owner process is gone
        except (OSError, ValueError):
            # no/corrupt metadata (owner crashed before writing): age the dir
            try:
                stale = time.time() - os.path.getmtime(lock) > ttl_sec
            except OSError:
                return False
        if not stale:
            return False
        shutil.rmtree(lock, ignore_errors=True)
        try:
            os.makedirs(lock)
        except FileExistsError:
            return False  # lost the reclaim race
    with open(meta, "w", encoding="utf-8") as f:
        json.dump(
            {"host": socket.gethostname(), "pid": os.getpid(), "time": time.time()},
            f,
        )
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    p.add_argument("workdir")
    p.add_argument("--detector_weights", default=None)
    p.add_argument("--tracker_weights", default=None)
    p.add_argument("--model", default="tiny", choices=["base", "small", "tiny"])
    p.add_argument("--num_classes", type=int, default=31)
    p.add_argument("--image_hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--max_rois", type=int, default=64)
    p.add_argument("--poll_sec", type=float, default=2.0)
    p.add_argument("--engine", default="staged", choices=["staged", "fused"],
                   help="staged = per-stage protos (per-stage crash resume); "
                        "fused = ONE device dispatch per video (serving "
                        "latency path; requires box protos — videos without "
                        "proposals fall back to the staged engine)")
    p.add_argument("--once", action="store_true", help="drain the queue and exit")
    p.add_argument("--lock_ttl_sec", type=float, default=3600.0,
                   help="reclaim locks older than this (crashed owners)")
    p.add_argument("--seed", type=int, default=0)
    # quality knobs — same semantics as the pipeline tool (RESULTS.md
    # hard-tier sweep: these are worth several mAP on hard data)
    p.add_argument("--template_eta", type=float, default=0.0,
                   help="EMA template adaptation rate (confidence-gated; "
                   "0 = frozen anchor template)")
    p.add_argument("--track_scales", type=int, default=1,
                   help="tracker scale-search candidates (1 = off)")
    p.add_argument("--boost", choices=["max", "mean"], default="max",
                   help="rescore boost statistic application")
    p.add_argument("--bg_decay", type=float, default=1.0,
                   help="score multiplier for dets on no tubelet")
    p.add_argument("--top_ratio", type=float, default=0.5,
                   help="tubelet statistic = mean of top this-fraction scores")
    p.add_argument("--min_matched_frac", type=float, default=0.0,
                   help="track-quality gate (see pipeline tool)")
    p.add_argument("--snap_weight", type=float, default=0.0,
                   help="detection snapping weight (see pipeline tool)")
    p.add_argument("--snap_iou", type=float, default=0.5,
                   help="min IoU for detection snapping")
    p.add_argument("--stat_floor", type=int, default=0,
                   help="length prior on the tubelet statistic (frames)")
    p.add_argument("--tubelet_boxes", action="store_true",
                   help="inject interior-gap track boxes as detections")
    args = p.parse_args(argv)

    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.checkpoint import load_params
    from vdetlib_tpu.pipeline.runner import Models, PipelineConfig, run_video
    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.utils.log import get_logger
    from vdetlib_tpu.video.detect import DetectOptions
    from vdetlib_tpu.video.link import LinkOptions
    from vdetlib_tpu.video.mgp import MGPOptions
    from vdetlib_tpu.video.rescore import RescoreOptions
    from vdetlib_tpu.video.track import TrackOptions, init_tracker

    log = get_logger("serve")
    hw = tuple(args.image_hw)
    det_cfg = detector_preset(args.model, num_classes=args.num_classes)
    det_model, det_params = init_detector(det_cfg, hw, args.max_rois, seed=args.seed)
    if args.detector_weights:
        det_params = load_params(args.detector_weights, template=det_params)
    trk_cfg = TrackerConfig(num_scales=args.track_scales,
                            template_eta=args.template_eta)
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=hw, seed=args.seed)
    if args.tracker_weights:
        trk_params = load_params(args.tracker_weights, template=trk_params)
    models = Models(det_model, det_params, trk_model, trk_params)
    cfg = PipelineConfig(
        detect=DetectOptions(max_rois=args.max_rois, image_hw=hw, score_thresh=0.05),
        mgp=MGPOptions(num_classes=args.num_classes, image_hw=hw),
        track=TrackOptions(
            image_hw=hw, snap_weight=args.snap_weight, snap_iou=args.snap_iou,
        ),
        tracker_cfg=trk_cfg,
        rescore=RescoreOptions(
            num_classes=args.num_classes, boost=args.boost,
            bg_decay=args.bg_decay, top_ratio=args.top_ratio,
            min_matched_frac=args.min_matched_frac,
            stat_floor=args.stat_floor,
            tubelet_boxes=args.tubelet_boxes,
        ),
        link=LinkOptions(num_classes=args.num_classes),
    )

    fused_engine = None
    if args.engine == "fused":
        from vdetlib_tpu.pipeline.fused_runner import FusedEngine

        fused_engine = FusedEngine(models, cfg)

    os.makedirs(args.workdir, exist_ok=True)
    log.info("serving %s → %s (%s engine)", args.data_dir, args.workdir, args.engine)
    processed = 0
    while True:
        did_work = False
        for vf in sorted(glob.glob(os.path.join(args.data_dir, "*.vid.json"))):
            name = os.path.basename(vf).replace(".vid.json", "")
            done_marker = os.path.join(args.workdir, name, "final.json")
            quarantine = os.path.join(args.workdir, name, "quarantine.json")
            lock = os.path.join(args.workdir, name + ".lock")
            if os.path.exists(done_marker) or os.path.exists(quarantine):
                continue
            if not try_lock(lock, ttl_sec=args.lock_ttl_sec):
                continue
            try:
                vid = proto_load(vf)
                bf = vf.replace(".vid.json", ".box.json")
                box = proto_load(bf) if os.path.exists(bf) else None
                log.info("processing %s (%d frames)", name, len(vid["frames"]))
                # Per-video errors must not kill the daemon: a raising video
                # would otherwise be re-picked after the lock vanishes on
                # restart — a crash loop on one bad input. Fused-load errors
                # (varying decode scales, missing proposals) fall back to the
                # staged engine; a video failing BOTH engines is quarantined
                # (marker skips it until an operator deletes the file).
                engine_used = "staged"
                tried_fused = fused_engine is not None and box is not None
                try:
                    if tried_fused:
                        from vdetlib_tpu.protos import proto_dump

                        loaded = fused_engine.load(vid, box)
                        det_proto, tubelets = fused_engine.run(vid, loaded)
                        vdir = os.path.join(args.workdir, name)
                        os.makedirs(vdir, exist_ok=True)
                        proto_dump(tubelets, os.path.join(vdir, "tubelets.json"))
                        proto_dump(det_proto, done_marker)
                        engine_used = "fused"
                    else:
                        if fused_engine is not None:
                            log.info(
                                "%s: no box proto — fused engine falls back "
                                "to staged", name,
                            )
                        run_video(args.workdir, vid, box, models, cfg)
                except Exception as e:  # noqa: BLE001 — daemon must survive
                    if not tried_fused or engine_used == "fused":
                        raise
                    log.warning(
                        "%s: fused engine failed (%s: %s) — retrying staged",
                        name, type(e).__name__, e,
                    )
                    run_video(args.workdir, vid, box, models, cfg)
                log.info("done %s (engine=%s)", name, engine_used)
                processed += 1
                did_work = True
            except Exception as e:  # noqa: BLE001
                log.exception("%s: failed on both engines — quarantined", name)
                os.makedirs(os.path.dirname(quarantine), exist_ok=True)
                with open(quarantine, "w", encoding="utf-8") as f:
                    json.dump(
                        {"video": name, "error": f"{type(e).__name__}: {e}",
                         "host": socket.gethostname(), "time": time.time()},
                        f,
                    )
                did_work = True  # progress was made (the video left the queue)
            finally:
                shutil.rmtree(lock, ignore_errors=True)
        if args.once and not did_work:
            log.info("queue drained: %d videos processed", processed)
            return 0
        if not did_work:
            time.sleep(args.poll_sec)


if __name__ == "__main__":
    raise SystemExit(main())
