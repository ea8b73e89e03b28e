#!/usr/bin/env python
"""Stream-side quality yardstick: online mAP at track_stride 1 vs 2.

The batch pipeline flipped its default to track_stride=2 after a held-out
-neutral verdict (RESULTS.md round 5), but the STREAMING engines kept
stride=1 pending a stream-side yardstick — the online tracker seeds/carries
differently (causal MGP, per-chunk seeding, boundary fill one chunk late),
so the batch verdict does not automatically transfer. This probe runs the
stream CLI (fused engine = production default) over the 10-video hard-tier
yardstick at both strides and evals final.json mAP@0.5, plus the staged
batch pipeline's mAP on the same data as the context row.

Run ON THE CHIP (one TPU process at a time):
    python scripts/stream_quality_r5.py [--chunk 8] [--data /tmp/dshard]
Needs /tmp/dshard + /tmp/ck_hard (RESULTS.md "Round-4 yardstick" recipes).
Prints one JSON line per config; artifacts in /tmp/sq5_s<stride>.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

NUM_CLASSES = 6
MAX_ROIS = 48


def sh(args_list, timeout):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "vdetlib_tpu"] + args_list,
        capture_output=True, text=True, timeout=timeout,
    )
    return proc, proc.stdout + proc.stderr, time.time() - t0


def eval_workdir(workdir, data, det_name="final.json"):
    """mAP@0.5 of <workdir>/<vid>/<det_name> vs the dataset annots (CPU).

    Forced to CPU at jax-config level so the chip stays free between the
    stream subprocesses (CLAUDE.md gotcha 5: the env var is ignored here).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vdetlib_tpu.evaluation.vid_map import vid_map
    from vdetlib_tpu.protos import proto_load

    pairs = []
    for name in sorted(os.listdir(workdir)):
        det_path = os.path.join(workdir, name, det_name)
        if not os.path.isdir(os.path.join(workdir, name)):
            continue
        assert os.path.exists(det_path), f"{det_path} missing"
        an = proto_load(os.path.join(data, f"{name}.annot.json"))
        pairs.append((proto_load(det_path), an))
    m, _ = vid_map(pairs)
    return float(m), len(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/dshard")
    ap.add_argument("--ck", default="/tmp/ck_hard")
    ap.add_argument("--chunk", type=int, default=8,
                    help="small vs the 30-frame videos so chunk-boundary "
                    "carries (the stride-2 boundary fill) are exercised")
    ap.add_argument("--strides", default="1,2")
    ap.add_argument("--with_batch_row", action="store_true",
                    help="also run the staged batch pipeline for context")
    args = ap.parse_args()

    assert os.path.isdir(args.data), f"{args.data} missing — RESULTS.md recipe"
    assert os.path.isdir(args.ck), f"{args.ck} missing — RESULTS.md recipe"
    vids = sorted(glob.glob(os.path.join(args.data, "*.vid.json")))
    assert vids, f"no vid protos in {args.data}"

    for stride in [int(s) for s in args.strides.split(",")]:
        work = f"/tmp/sq5_s{stride}"
        shutil.rmtree(work, ignore_errors=True)
        proc, out, dt = sh(
            ["stream", *vids, work,
             "--detector_weights", args.ck, "--model", "small",
             "--num_classes", str(NUM_CLASSES),
             "--max_rois", str(MAX_ROIS),
             "--chunk", str(args.chunk),
             "--track_stride", str(stride)],
            timeout=3600,
        )
        row = {"config": f"stream_stride{stride}", "chunk": args.chunk,
               "wall_s": round(dt, 1)}
        if proc.returncode != 0:
            row["error"] = out[-800:]
            print(json.dumps(row), flush=True)
            continue
        m, n = eval_workdir(work, args.data)
        row.update(mAP=round(m, 4), videos=n)
        print(json.dumps(row), flush=True)

    if args.with_batch_row:
        work = "/tmp/sq5_batch"
        shutil.rmtree(work, ignore_errors=True)
        proc, out, dt = sh(
            ["pipeline", args.data, work,
             "--detector_weights", args.ck, "--model", "small",
             "--num_classes", str(NUM_CLASSES),
             "--max_rois", str(MAX_ROIS),
             "--bg_decay", "0.7", "--boost", "mean", "--eval"],
            timeout=3600,
        )
        import re

        m = re.search(r"mAP = ([\d.]+) over", out)
        print(json.dumps({
            "config": "batch_r4_config", "wall_s": round(dt, 1),
            "mAP": float(m.group(1)) if m else None,
            "error": None if proc.returncode == 0 and m else out[-800:],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
