"""Per-frame detection stage: vid_proto + box_proto → det_proto.

Reference parity: the detection runner tool wrapping
``vdetlib/vid/detect.py::det_vid`` (SURVEY.md §3.1), with the external Caffe
net replaced by the JAX detector. Weights come from an Orbax checkpoint
(``--weights``); without one, deterministic random init (``--seed``) — useful
for smoke tests and throughput work.
"""

from __future__ import annotations

import argparse

from vdetlib_tpu.protos import proto_dump, proto_exists, proto_load


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vid_file")
    p.add_argument("box_file")
    p.add_argument("output")
    p.add_argument("--weights", default=None, help="orbax checkpoint dir")
    p.add_argument("--model", default="base", choices=["base", "small", "tiny"])
    p.add_argument("--num_classes", type=int, default=31)
    p.add_argument("--image_hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_rois", type=int, default=128)
    p.add_argument("--score_thresh", type=float, default=0.005)
    p.add_argument("--no_regress", action="store_true")
    p.add_argument("--pyramid", type=float, nargs="+", default=[1.0],
                   help="image pyramid scales (scores max-pooled over scales)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    if proto_exists(args.output) and not args.overwrite:
        print(f"skip (exists): {args.output}")
        return 0

    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.pipeline.checkpoint import load_params
    from vdetlib_tpu.video.detect import DetectOptions, det_vid

    cfg = detector_preset(args.model, num_classes=args.num_classes)
    model, params = init_detector(
        cfg, tuple(args.image_hw), max_rois=args.max_rois, seed=args.seed
    )
    if args.weights:
        params = load_params(args.weights, template=params)

    vid = proto_load(args.vid_file)
    boxes = proto_load(args.box_file)
    opts = DetectOptions(
        batch_size=args.batch_size,
        max_rois=args.max_rois,
        image_hw=tuple(args.image_hw),
        score_thresh=args.score_thresh,
        regress=not args.no_regress,
        pyramid=tuple(args.pyramid),
    )
    det = det_vid(model, params, vid, boxes, opts)
    proto_dump(det, args.output)
    print(f"wrote {args.output}: {len(det['detections'])} detections")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
