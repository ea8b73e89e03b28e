"""Tubelet tracking stage: vid_proto + det_proto → track_proto.

Reference parity: the tracking runner tool wrapping
``vdetlib/vid/track.py::track_from_det`` (SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse

from vdetlib_tpu.protos import proto_dump, proto_exists, proto_load


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vid_file")
    p.add_argument("det_file")
    p.add_argument("output")
    p.add_argument("--weights", default=None, help="orbax checkpoint for TrackerNet")
    p.add_argument("--max_tracks", type=int, default=32)
    p.add_argument("--anchors_per_round", type=int, default=8)
    p.add_argument("--anchor_thresh", type=float, default=0.3)
    p.add_argument("--conf_thresh", type=float, default=0.5)
    p.add_argument("--cover_thresh", type=float, default=0.5)
    p.add_argument("--snap_weight", type=float, default=0.0,
                   help="detection snapping: blend tracked boxes toward the "
                        "best overlapping same-frame detection (0 = off)")
    p.add_argument("--snap_iou", type=float, default=0.5)
    p.add_argument("--image_hw", type=int, nargs=2, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    if proto_exists(args.output) and not args.overwrite:
        print(f"skip (exists): {args.output}")
        return 0

    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.checkpoint import load_params
    from vdetlib_tpu.video.track import TrackOptions, init_tracker, track_from_det

    vid = proto_load(args.vid_file)
    det = proto_load(args.det_file)
    cfg = TrackerConfig()
    image_hw = tuple(args.image_hw) if args.image_hw else None
    # init shape only matters for param shapes (fully convolutional)
    model, params = init_tracker(cfg, image_hw=image_hw or (240, 320), seed=args.seed)
    if args.weights:
        params = load_params(args.weights, template=params)
    opts = TrackOptions(
        max_tracks=args.max_tracks,
        anchors_per_round=args.anchors_per_round,
        anchor_thresh=args.anchor_thresh,
        conf_thresh=args.conf_thresh,
        cover_thresh=args.cover_thresh,
        snap_weight=args.snap_weight,
        snap_iou=args.snap_iou,
        image_hw=image_hw,
    )
    tp = track_from_det(model, params, vid, det, cfg, opts)
    proto_dump(tp, args.output)
    print(f"wrote {args.output}: {len(tp['tracks'])} tracks")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
