#!/usr/bin/env python
"""Detector-recall probe (VERDICT r4 item 5): does detector capacity move
the hard-tier floor?

The headroom map bounds the pipeline by detector recall (per-frame 0.4541
yardstick / 0.4908 held-out with the small preset) and the oracle ladder
caps the full system near 0.66. This probe trains the next preset up
(`base`, ~4x the small preset's channel widths) with the EXACT recipe that
produced /tmp/ck_hard (1200 steps, hard tier, best-held-out selection) and
measures, on both the yardstick (/tmp/dshard) and the held-out 100 videos
(/tmp/dshard100):

  1. per-frame baseline = detect + frame NMS 0.3 (host path) on the SAME
     detect.json the full run produced (one chip pass per dataset), and
  2. the full R4 pipeline (detect -> MGP -> track -> rescore -> seq-NMS).

Run ON THE CHIP (one TPU process at a time):
    python scripts/detector_probe_r5.py [--model base] [--steps 1200]
Prints one JSON line per measurement; artifacts in /tmp/ck_hard_<model>,
/tmp/dp5_<model>_{yard,ho}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

DATASETS = {"yard": "/tmp/dshard", "ho": "/tmp/dshard100"}
NUM_CLASSES = 6
MAX_ROIS = 48


def sh(args_list, timeout):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "vdetlib_tpu"] + args_list,
        capture_output=True, text=True, timeout=timeout,
    )
    return proc, proc.stdout + proc.stderr, time.time() - t0


def frame_nms_map(workdir, data):
    """Per-frame baseline from the staged run's detect.json (host path).

    Forced to CPU at jax-config level (NOT via env, which would leak into
    the pipeline subprocesses and is ignored by this terminal anyway —
    CLAUDE.md gotcha 5): the chip stays free for the staged runs.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vdetlib_tpu.evaluation.vid_map import vid_map
    from vdetlib_tpu.protos import proto_load
    from vdetlib_tpu.video.frame_nms import frame_nms

    pairs = []
    for name in sorted(os.listdir(workdir)):
        if not os.path.isdir(os.path.join(workdir, name)):
            continue
        det_path = os.path.join(workdir, name, "detect.json")
        assert os.path.exists(det_path), f"{det_path} missing"
        vid = proto_load(os.path.join(data, f"{name}.vid.json"))
        an = proto_load(os.path.join(data, f"{name}.annot.json"))
        pairs.append((frame_nms(vid, proto_load(det_path), thresh=0.3,
                                backend="host"), an))
    m, _ = vid_map(pairs)
    return float(m), len(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="base", choices=["base", "small"])
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing /tmp/ck_hard_<model>")
    ap.add_argument("--tag", default=None,
                    help="checkpoint/workdir suffix for RECIPE probes "
                    "(round 5 tail: capacity is closed, recipes are the "
                    "open direction) — e.g. --tag nv32")
    ap.add_argument("--train_arg", action="append", default=[],
                    help="extra train_detector flag, repeatable "
                    "(e.g. --train_arg=--num_videos --train_arg=32)")
    ap.add_argument("--datasets", default="yard,ho",
                    help="comma subset of {yard,ho} to measure")
    args = ap.parse_args()

    tag = f"_{args.tag}" if args.tag else ""
    ck = f"/tmp/ck_hard_{args.model}{tag}"
    for d in DATASETS.values():
        assert os.path.isdir(d), f"{d} missing — regenerate per RESULTS.md"

    # ---- 1. train (mirrors the ck_hard recipe, only the preset changes) --
    if not (args.skip_train and os.path.isdir(ck)):
        shutil.rmtree(ck, ignore_errors=True)
        proc, out, dt = sh(
            ["train_detector", ck, "--model", args.model,
             "--num_classes", str(NUM_CLASSES), "--steps", str(args.steps),
             "--tier", "hard", "--eval_every", "100"] + args.train_arg,
            timeout=7200,
        )
        best = re.findall(r"held-out mAP@0\.5 = ([\d.]+)", out)
        row = {"stage": f"train_{args.model}{tag}", "wall_s": round(dt, 1),
               "heldout_curve": [float(x) for x in best]}
        if proc.returncode != 0:
            row["error"] = out[-800:]
            print(json.dumps(row), flush=True)
            return 1
        print(json.dumps(row), flush=True)

    # ---- 2. full pipeline + per-frame baseline on both datasets ---------
    base_flags = ["--detector_weights", ck, "--model", args.model,
                  "--num_classes", str(NUM_CLASSES),
                  "--max_rois", str(MAX_ROIS),
                  "--bg_decay", "0.7", "--boost", "mean", "--eval"]
    wanted = set(args.datasets.split(","))
    for ds, data in DATASETS.items():
        if ds not in wanted:
            continue
        work = f"/tmp/dp5_{args.model}{tag}_{ds}"
        shutil.rmtree(work, ignore_errors=True)
        proc, out, dt = sh(["pipeline", data, work] + base_flags,
                           timeout=7200)
        m = re.search(r"mAP = ([\d.]+) over", out)
        row = {"config": f"{args.model}{tag}_{ds}_full",
               "mAP": float(m.group(1)) if m else None,
               "wall_s": round(dt, 1)}
        if proc.returncode != 0 or not m:
            row["error"] = out[-800:]
        print(json.dumps(row), flush=True)
        if proc.returncode != 0:
            continue
        pf, n = frame_nms_map(work, data)
        print(json.dumps({"config": f"{args.model}{tag}_{ds}_perframe",
                          "mAP": round(pf, 4), "videos": n}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
