"""VID submission writer: det_protos → ILSVRC txt (global frame numbering)."""

from __future__ import annotations

import argparse

from vdetlib_tpu.evaluation.submission import write_submission
from vdetlib_tpu.protos import proto_load


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument(
        "--pairs",
        nargs="+",
        required=True,
        help="alternating vid_proto det_proto paths (vid1 det1 vid2 det2 ...)",
    )
    args = p.parse_args(argv)
    if len(args.pairs) % 2:
        raise SystemExit("--pairs needs an even number of paths")
    vids = [proto_load(p_) for p_ in args.pairs[0::2]]
    dets = [proto_load(p_) for p_ in args.pairs[1::2]]
    n = write_submission(dets, vids, args.output)
    print(f"wrote {args.output}: {n} lines over {len(vids)} videos")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
