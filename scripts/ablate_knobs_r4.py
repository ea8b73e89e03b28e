"""Round-4 knob ablation on the hard-tier yardstick (VERDICT r3 item 4).

Runs the staged pipeline CLI over /tmp/dshard (hard tier, seed 500, 10
videos) with the R4 quality config (bg_decay 0.7, boost mean) and sweeps
the two new knobs — tracker detection snapping (--snap_weight) and the
tubelet-statistic length prior (--stat_floor) — in both the full pipeline
and the no-seq-NMS regime the round-3 verdict targeted. Prints one JSON
line per config.

Provenance: /tmp/dshard + /tmp/ck_hard per RESULTS.md "Round-4 yardstick";
run ON THE CHIP (one TPU process at a time):
    python scripts/ablate_knobs_r4.py [--configs name1,name2]
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

DATA = "/tmp/dshard"
BASE = [
    "--detector_weights", "/tmp/ck_hard", "--model", "small",
    "--num_classes", "6", "--max_rois", "48",
    "--bg_decay", "0.7", "--boost", "mean", "--eval",
]
NO_LINK = ["--stages", "detect,mgp,track,rescore"]

CONFIGS = {
    # full pipeline
    "base": [],
    "snap05": ["--snap_weight", "0.5"],
    "snap075": ["--snap_weight", "0.75"],
    "snap05_iou04": ["--snap_weight", "0.5", "--snap_iou", "0.4"],
    "floor3": ["--stat_floor", "3"],
    "floor5": ["--stat_floor", "5"],
    "snap05_floor3": ["--snap_weight", "0.5", "--stat_floor", "3"],
    # no-seq-NMS regime (rescore must stand on its own)
    "nolink_base": NO_LINK,
    "nolink_floor3": NO_LINK + ["--stat_floor", "3"],
    "nolink_floor5": NO_LINK + ["--stat_floor", "5"],
    "nolink_snap05": NO_LINK + ["--snap_weight", "0.5"],
    # tracker coverage/localization sweep (track-attribution probe direction:
    # 4 unseeded objects cost 2.1 mAP; localization quality costs 3.3 —
    # RESULTS.md "Track-error attribution")
    "mt24": ["--max_tracks", "24"],
    "mt32": ["--max_tracks", "32"],
    "anchor02": ["--anchor_thresh", "0.2"],
    "mt32_anchor02": ["--max_tracks", "32", "--anchor_thresh", "0.2"],
    "scales3": ["--track_scales", "3"],
    "conf03": ["--track_conf", "0.3"],
    "conf07": ["--track_conf", "0.7"],
    # composites with the hard-tier-trained tracker (/tmp/trk_hard,
    # train_tracker --tier hard --steps 600)
    "mt32_trained": ["--max_tracks", "32", "--tracker_weights", "/tmp/trk_hard"],
    "mt32_trained_s3": [
        "--max_tracks", "32", "--tracker_weights", "/tmp/trk_hard",
        "--track_scales", "3",
    ],
    "trained": ["--tracker_weights", "/tmp/trk_hard"],
    "nolink_mt32": NO_LINK + ["--max_tracks", "32"],
    "nolink_mt32_trained": NO_LINK + [
        "--max_tracks", "32", "--tracker_weights", "/tmp/trk_hard",
    ],
    # round 5: occlusion/distractor-aware tracker recipe (/tmp/trk_aware,
    # train_tracker --recipe aware --tier hard --steps 600) — VERDICT r4
    # item 4, the +3.3 localization slice
    "aware": ["--tracker_weights", "/tmp/trk_aware"],
    "mt32_aware": ["--max_tracks", "32", "--tracker_weights", "/tmp/trk_aware"],
    "aware_s3": ["--tracker_weights", "/tmp/trk_aware", "--track_scales", "3"],
    # round 5: tracker frame stride (VERDICT r4 item 6) — quality side of
    # the ~10 ms/video scan-step lever; speed side in bench_components.py
    "stride2": ["--track_stride", "2"],
    "stride2_mt32": ["--track_stride", "2", "--max_tracks", "32"],
    # stride dose curve: does more interpolation smoothing help or is 2 the
    # sweet spot? (stride2 measured +0.4 on the yardstick draw)
    "stride3": ["--track_stride", "3"],
    "stride3_mt32": ["--track_stride", "3", "--max_tracks", "32"],
    # round 5: EMA template adaptation (training-free localization lever —
    # the hard tier drifts appearance ±35% against a frozen anchor template)
    "eta005": ["--template_eta", "0.05"],
    "eta01": ["--template_eta", "0.1"],
    "eta02": ["--template_eta", "0.2"],
    "mt32_eta01": ["--max_tracks", "32", "--template_eta", "0.1"],
}


def run_one(name: str, extra: list, data: str = DATA, prefix: str = "abl") -> dict:
    work = f"/tmp/{prefix}_{name}"
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "vdetlib_tpu", "pipeline", data, work] + BASE + extra,
        capture_output=True, text=True, timeout=3600,
    )
    out = proc.stdout + proc.stderr
    m = re.search(r"mAP = ([\d.]+) over", out)
    row = {
        "config": name,
        "mAP": float(m.group(1)) if m else None,
        "wall_s": round(time.time() - t0, 1),
    }
    if proc.returncode != 0 or not m:
        row["error"] = out[-800:]
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma list (default: all, in table order)")
    ap.add_argument("--data", default=DATA,
                    help="dataset dir (e.g. /tmp/dshard100 for held-out)")
    ap.add_argument("--prefix", default="abl", help="workdir prefix /tmp/<p>_")
    args = ap.parse_args()
    names = args.configs.split(",") if args.configs else list(CONFIGS)
    assert os.path.isdir(args.data) and os.path.isdir("/tmp/ck_hard"), \
        "yardstick artifacts missing — see RESULTS.md Round-4 yardstick"
    for name in names:
        run_one(name, CONFIGS[name], data=args.data, prefix=args.prefix)


if __name__ == "__main__":
    main()
