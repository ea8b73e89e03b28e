"""Full T-CNN pipeline over a video set: detect → MGP → track → rescore → seq-NMS.

Reference parity: the per-video driver scripts of the reference pipeline
(SURVEY.md §3.4), with resume-by-existence at every stage and optional
shard selection for multi-process / multi-host sweeps.

Dataset layout (as produced by ``gen_synth``): ``<data>/NAME.vid.json`` +
``NAME.box.json`` (+ optional ``NAME.annot.json`` for --eval).
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    p.add_argument("workdir")
    p.add_argument("--detector_weights", default=None)
    p.add_argument("--tracker_weights", default=None)
    p.add_argument("--model", default="tiny", choices=["base", "small", "tiny"])
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--image_hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--max_rois", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--mgp_window", type=int, default=1)
    p.add_argument("--flow_preset", default="fastest",
                   choices=["accurate", "fast", "fastest"],
                   help="MGP optical-flow resolution/speed tradeoff")
    p.add_argument("--max_tracks", type=int, default=16)
    p.add_argument("--track_stride", type=int, default=2,
                   help="NCC scan advances every s-th frame, interpolating "
                   "the rest (video/track.py::track_batch frame_stride); "
                   "default 2 halves tracker compute at held-out-neutral "
                   "quality (RESULTS.md round 5) — set 1 for frame-exact "
                   "reference semantics")
    p.add_argument(
        "--template_eta", type=float, default=0.0,
        help="EMA template adaptation rate (appearance-drift remedy; "
        "confidence-gated — TrackerConfig.template_eta; 0 = frozen "
        "anchor template)")
    p.add_argument(
        "--track_scales", type=int, default=1,
        help="scale-adaptive tracking: NCC scales per step (1 = off; 3 with "
        "trained tracker features recommended for zooming objects)",
    )
    p.add_argument("--stages", default="detect,mgp,track,rescore,seq_nms",
                   help="comma list; insert 'perturb' after track to enable "
                        "tubelet box perturbation + detector max-pooling")
    p.add_argument("--perturb_n", type=int, default=8,
                   help="perturbations per tubelet box (perturb stage)")
    p.add_argument("--tubelet_boxes", action="store_true",
                   help="T-CNN tubelet-box semantics: live track boxes with "
                        "no matched detection enter the det set scored by "
                        "the tubelet statistic (gap-filling through "
                        "occlusions/detector dropouts) — both engines, "
                        "parity-locked")
    p.add_argument("--anchor_thresh", type=float, default=0.3,
                   help="min det score to seed a track (TrackOptions)")
    p.add_argument("--track_conf", type=float, default=0.5,
                   help="tracker termination confidence (TrackOptions)")
    p.add_argument("--snap_weight", type=float, default=0.0,
                   help="detection snapping: blend each tracked box this far "
                        "toward the best same-frame detection overlapping it "
                        "(IoU > --snap_iou, anchor-candidate set) — "
                        "re-anchors the tracker to detector evidence so "
                        "correlation drift cannot compound (0 = off)")
    p.add_argument("--snap_iou", type=float, default=0.5,
                   help="min IoU for detection snapping (see --snap_weight)")
    p.add_argument("--stat_floor", type=int, default=0,
                   help="length prior on the tubelet statistic: top-k mean "
                        "denominator is at least this many frames, damping "
                        "short flicker tracks (0 = off)")
    p.add_argument("--boost", default="max", choices=["max", "mean"],
                   help="rescore boost statistic application")
    p.add_argument("--bg_decay", type=float, default=1.0,
                   help="score multiplier for dets on no tubelet")
    p.add_argument("--min_matched_frac", type=float, default=0.0,
                   help="track-quality gate: a track boosts/injects only if "
                        "dets match it on >= this fraction of its live "
                        "frames (flickering-distractor filter; 0 = off)")
    p.add_argument("--top_ratio", type=float, default=0.5,
                   help="tubelet statistic = mean of top this-fraction scores")
    p.add_argument("--shard", type=int, nargs=2, default=[0, 1], metavar=("I", "N"))
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (coordinator from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID) and auto-shard the video list by "
                        "process index; --eval metrics all-reduce across "
                        "processes")
    p.add_argument("--engine", default="staged", choices=["staged", "fused"],
                   help="staged = JSON proto at every stage boundary (per-stage "
                        "resume); fused = one device dispatch per video, same "
                        "final protos (parity-locked), ~order-of-magnitude "
                        "faster sweep")
    p.add_argument("--fused_group", type=int, default=1,
                   help="fused engine: videos per device dispatch (same-bucket "
                        "vmap). >1 amortizes per-dispatch overhead (~+14%% at "
                        "4 on the bench workload) but the batched program's "
                        "bf16 reassociation can flip near-tied NMS decisions "
                        "vs the single-video executable")
    p.add_argument("--staged_workers", type=int, default=1,
                   help="staged engine: videos in flight at once (>1 overlaps "
                        "one video's host JSON/glue work with another's "
                        "device compute; outputs and resume semantics "
                        "unchanged)")
    p.add_argument("--keep_going", action="store_true",
                   help="sweep mode: log-and-skip videos that fail instead of "
                        "aborting the run (exit code 1 if any failed; failed "
                        "videos have no final.json and are retried on rerun "
                        "via resume-by-existence)")
    p.add_argument("--eval", action="store_true", help="compute mAP vs annot protos")
    p.add_argument(
        "--calibrate", default="none", choices=["none", "rank"],
        help="per-video score calibration before pooled eval "
        "(evaluation/calibration.py; 'rank' = label-free quantile transform)",
    )
    p.add_argument(
        "--calibrate_blend", type=float, default=0.0,
        help="rank calibration: (1-blend)*quantile + blend*raw (0 = pure "
        "rank transform — junk-only videos get promoted; see calibration.py)",
    )
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from vdetlib_tpu.dist.sharding import shard_videos
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.checkpoint import load_params
    from vdetlib_tpu.pipeline.runner import Models, PipelineConfig, run_videos
    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.video.detect import DetectOptions
    from vdetlib_tpu.video.link import LinkOptions
    from vdetlib_tpu.video.mgp import MGPOptions
    from vdetlib_tpu.video.rescore import RescoreOptions
    from vdetlib_tpu.video.track import TrackOptions, init_tracker

    vid_files = sorted(glob.glob(os.path.join(args.data_dir, "*.vid.json")))
    if args.multihost:
        from vdetlib_tpu.dist.multihost import init_multihost, process_video_shard

        init_multihost()
        vid_files = process_video_shard(vid_files)
    else:
        vid_files = shard_videos(vid_files, args.shard[0], args.shard[1])
    if not vid_files:
        raise SystemExit(f"no *.vid.json under {args.data_dir} for this shard")

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

    perturb_opts = None
    if "perturb" in args.stages.split(","):
        from vdetlib_tpu.video.perturb import PerturbOptions

        perturb_opts = PerturbOptions(num_perturb=args.perturb_n)
    cfg = PipelineConfig(
        detect=DetectOptions(
            batch_size=args.batch_size, max_rois=args.max_rois, image_hw=hw,
            score_thresh=0.05,
        ),
        mgp=MGPOptions(
            window=args.mgp_window, num_classes=args.num_classes, image_hw=hw,
            flow_preset=args.flow_preset,
        ),
        track=TrackOptions(
            max_tracks=args.max_tracks, image_hw=hw,
            anchor_thresh=args.anchor_thresh, conf_thresh=args.track_conf,
            snap_weight=args.snap_weight, snap_iou=args.snap_iou,
            frame_stride=args.track_stride,
        ),
        tracker_cfg=trk_cfg,
        rescore=RescoreOptions(
            num_classes=args.num_classes, tubelet_boxes=args.tubelet_boxes,
            boost=args.boost, bg_decay=args.bg_decay,
            top_ratio=args.top_ratio,
            min_matched_frac=args.min_matched_frac,
            stat_floor=args.stat_floor,
        ),
        link=LinkOptions(num_classes=args.num_classes),
        perturb=perturb_opts,
        stages=tuple(args.stages.split(",")),
    )
    models = Models(det_model, det_params, trk_model, trk_params)

    inputs = []
    for vf in vid_files:
        vid = proto_load(vf)
        bf = vf.replace(".vid.json", ".box.json")
        box = proto_load(bf) if os.path.exists(bf) else None
        inputs.append((vid, box))
    if args.engine == "fused":
        from vdetlib_tpu.pipeline.fused_runner import run_videos_fused

        results = run_videos_fused(
            args.workdir, inputs, models, cfg, group_size=args.fused_group,
            keep_going=args.keep_going,
        )
    else:
        results = run_videos(
            args.workdir, inputs, models, cfg, workers=args.staged_workers,
            keep_going=args.keep_going,
        )
    failed = [p for p in results if p.get("error")]
    if failed:
        from vdetlib_tpu.utils.log import get_logger

        get_logger("pipeline").warning(
            "%d/%d videos failed: %s", len(failed), len(results),
            ", ".join(p.get("video", p["result"]) for p in failed),
        )

    if args.eval:
        from vdetlib_tpu.evaluation.vid_map import vid_map

        eval_pairs = list(zip(vid_files, (p["result"] for p in results)))
        if args.multihost:
            import jax

            from vdetlib_tpu.dist.multihost import allreduce_metrics

            # barrier: every process finished writing its shard's protos
            allreduce_metrics({"shards_done": 1.0})
            if jax.process_index() != 0:
                return 0
            # process 0 evaluates over ALL shards' outputs (shared workdir)
            all_files = sorted(glob.glob(os.path.join(args.data_dir, "*.vid.json")))
            eval_pairs = []
            for vf in all_files:
                video = os.path.basename(vf)[: -len(".vid.json")]
                rf = os.path.join(args.workdir, video, "final.json")
                if os.path.exists(rf):
                    eval_pairs.append((vf, rf))

        pairs = []
        for vf, rf in eval_pairs:
            af = vf.replace(".vid.json", ".annot.json")
            if os.path.exists(af) and os.path.exists(rf):  # rf absent = failed video
                dp = proto_load(rf)
                if args.calibrate == "rank":
                    from vdetlib_tpu.evaluation.calibration import rank_normalize

                    dp = rank_normalize(dp, blend=args.calibrate_blend)
                pairs.append((dp, proto_load(af)))
        m, aps = vid_map(pairs)
        for ci in sorted(aps):
            print(f"class {ci}: AP = {aps[ci]:.4f}")
        print(f"mAP = {m:.4f} over {len(pairs)} videos")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
