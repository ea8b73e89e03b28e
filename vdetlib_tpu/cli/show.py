"""Visualization tools: show_det / show_track — annotated frame dumps.

Reference parity: the show-detection / show-track tools over
``vdetlib/utils/visual.py`` (SURVEY.md §2.2).
"""

from __future__ import annotations

import argparse

from vdetlib_tpu.protos import proto_load
from vdetlib_tpu.utils.visual import show_detections, show_tracks


def main(argv=None, tool: str = "show_det") -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("vid_file")
    p.add_argument("proto_file", help="det_proto (show_det) or track_proto (show_track)")
    p.add_argument("out_dir")
    p.add_argument("--score_thresh", type=float, default=0.1)
    args = p.parse_args(argv)

    vid = proto_load(args.vid_file)
    proto = proto_load(args.proto_file)
    if tool == "show_track" or "tracks" in proto:
        written = show_tracks(vid, proto, args.out_dir)
    else:
        written = show_detections(vid, proto, args.out_dir, args.score_thresh)
    print(f"wrote {len(written)} annotated frames to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
