"""Per-frame per-class NMS over a det_proto (the suppression tool).

Config 1 of the capability contract (BASELINE.json:7): pure CPU by default,
JSON protos in/out. ``--backend xla`` runs the batched device kernel instead.
"""

from __future__ import annotations

import argparse

from vdetlib_tpu.protos import proto_dump, proto_exists, proto_load
from vdetlib_tpu.utils.log import StageMetrics
from vdetlib_tpu.video.frame_nms import frame_nms


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vid_file", help="input vid_proto")
    p.add_argument("det_file", help="input det_proto")
    p.add_argument("output", help="output det_proto")
    p.add_argument("--thresh", type=float, default=0.3, help="IoU threshold")
    p.add_argument(
        "--backend", choices=["host", "xla", "fixpoint", "pallas"], default="host"
    )
    p.add_argument("--max_boxes", type=int, default=512, help="xla padding budget")
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    if proto_exists(args.output) and not args.overwrite:
        print(f"skip (exists): {args.output}")
        return 0
    metrics = StageMetrics("frame_nms")
    vid = proto_load(args.vid_file)
    det = proto_load(args.det_file)
    out = frame_nms(
        vid, det, thresh=args.thresh, backend=args.backend, max_boxes=args.max_boxes
    )
    proto_dump(out, args.output)
    metrics.set("frames", len(vid["frames"]))
    metrics.set("dets_in", len(det["detections"]))
    metrics.set("dets_out", len(out["detections"]))
    metrics.finish()
    print(
        f"wrote {args.output}: {len(out['detections'])} detections "
        f"(from {len(det['detections'])})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
