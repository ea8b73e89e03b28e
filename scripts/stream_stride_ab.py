#!/usr/bin/env python
"""Focused fused-engine track_stride 1-vs-2 latency A/B (round 5 tail).

bench_stream.py's chain differencing (min over 3 passes of t_hi - t_lo)
gives clean ABSOLUTE ms/chunk in quiet windows, but under heavy chip
weather the per-run noise (seconds) swamps the 1-2 s signal and min() picks
the most-negative noise excursion — the 2026-08-20 window produced negative
rows. For the stride DECISION only the s1-s2 DIFFERENCE matters, and both
strides share every fixed cost at equal stream length, so: run the SAME
(chunk, n_chunks) config alternating stride 1 / stride 2 back-to-back,
many reps, and compare MEDIAN totals — weather hits both lanes alike
(CLAUDE.md "in-process interleaved A/B for variant comparisons").

Run ON THE CHIP:  python scripts/stream_stride_ab.py [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--configs", default="8:32,16:16",
                    help="comma list of chunk:n_chunks")
    args = ap.parse_args()

    import bench as B
    import bench_stream as BS
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.video.track import init_tracker

    frames_np, rois_np = B.build_inputs()
    det_cfg = detector_preset("base", num_classes=B.C)
    det_model, det_p = init_detector(det_cfg, (B.H, B.W), max_rois=B.R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_p = init_tracker(trk_cfg, image_hw=(B.H, B.W), seed=0)
    models = (det_model, det_p, trk_model, trk_p, trk_cfg)

    for spec in args.configs.split(","):
        chunk, n_chunks = (int(v) for v in spec.split(":"))
        # warm both strides (compiles + caches)
        for s in (1, 2):
            BS.run_stream(models, frames_np, rois_np, chunk, n_chunks,
                          "fused", s)
        totals = {1: [], 2: []}
        for _ in range(args.reps):
            for s in (1, 2):
                totals[s].append(BS.run_stream(
                    models, frames_np, rois_np, chunk, n_chunks, "fused", s))
        med = {s: statistics.median(v) for s, v in totals.items()}
        row = {
            "chunk": chunk,
            "n_chunks": n_chunks,
            "median_total_s1": round(med[1], 3),
            "median_total_s2": round(med[2], 3),
            "s2_minus_s1_ms_per_chunk": round(
                (med[2] - med[1]) / n_chunks * 1e3, 2),
            "spread_s1": round(max(totals[1]) - min(totals[1]), 3),
            "spread_s2": round(max(totals[2]) - min(totals[2]), 3),
        }
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
