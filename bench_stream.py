"""Streaming-mode latency benchmark (VERDICT r3 item 6 / SURVEY.md §5.7).

The online pipeline's defining number is per-chunk latency: a frame that
arrives at the start of a chunk becomes a detection proto only after the
chunk fills AND the chunk is processed. This bench measures the steady-state
PROCESSING latency per chunk — by chain differencing whole streams of n1 vs
n2 chunks (CLAUDE.md "BENCHMARK METHODOLOGY": the streaming loop is
host-driven with several device dispatches per chunk, so per-chunk wall time
includes real tunnel floors that a naive total/chunks split would smear over
warmup) — at chunk sizes 8/16/32, plus the amortized ms/frame next to the
batch path's number for the throughput-vs-latency trade.

Workload: bench.py's scale (240x320, base detector, R=64, C=31) so the
streaming numbers are directly comparable to the 2200 fps batch headline.

Run ON THE CHIP (one TPU process at a time):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python bench_stream.py
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import bench as B
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.video.stream import StreamOptions, stream_video
from vdetlib_tpu.video.track import init_tracker

H, W, R, C = B.H, B.W, B.R, B.C


def run_stream(models, frames, rois, chunk, n_chunks, engine, stride=1):
    det_model, det_p, trk_model, trk_p, trk_cfg = models
    opts = StreamOptions(engine=engine, chunk=chunk, max_rois=R,
                         num_classes=C, flow_preset="fastest",
                         track_stride=stride)
    T = chunk * n_chunks

    def chunks():
        for i in range(n_chunks):
            yield frames[i * chunk : (i + 1) * chunk]

    t0 = time.perf_counter()
    out = stream_video(det_model, det_p, trk_model, trk_p, trk_cfg,
                       chunks(), rois[:T], opts)
    dt = time.perf_counter() - t0
    assert out["num_frames"] == T
    return dt


def main():
    frames_np, rois_np = B.build_inputs()  # 256 frames @ 240x320, 64 rois
    det_cfg = detector_preset("base", num_classes=C)
    det_model, det_p = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
    models = (det_model, det_p, trk_model, trk_p, trk_cfg)

    # STREAM_ENGINES / STREAM_STRIDES env vars narrow a run (e.g. the
    # fused stride A/B: STREAM_ENGINES=fused STREAM_STRIDES=1,2)
    engines = os.environ.get("STREAM_ENGINES", "fused,host").split(",")
    strides = [int(v) for v in os.environ.get("STREAM_STRIDES", "1").split(",")]
    results = []
    for engine in engines:
        for stride in strides:
            for chunk, (n1, n2) in [(32, (4, 8)), (16, (8, 16)), (8, (16, 32))]:
                # compile-warm BOTH lengths (first call of each trips the same
                # executables, but host-side shapes differ in the final seq-NMS)
                run_stream(models, frames_np, rois_np, chunk, n1, engine, stride)
                run_stream(models, frames_np, rois_np, chunk, n2, engine, stride)
                best = 1e9
                for _ in range(3):
                    t_lo = run_stream(models, frames_np, rois_np, chunk, n1, engine, stride)
                    t_hi = run_stream(models, frames_np, rois_np, chunk, n2, engine, stride)
                    best = min(best, (t_hi - t_lo) / (n2 - n1))
                ms_chunk = best * 1e3
                row = {
                    "engine": engine,
                    "stride": stride,
                    "chunk": chunk,
                    "ms_per_chunk": round(ms_chunk, 1),
                    "ms_per_frame": round(ms_chunk / chunk, 2),
                    "stream_fps": round(1e3 * chunk / ms_chunk, 1),
                }
                results.append(row)
                print(json.dumps(row), flush=True)

    # Worst-case end-to-end frame lag at a given ingest rate: the first frame
    # of a chunk waits (chunk-1)/fps_in for the chunk to fill, then one
    # processing latency. Report at 30 fps ingest (VID-like video rate).
    for row in results:
        fill_ms = (row["chunk"] - 1) / 30.0 * 1e3
        row2 = {
            "engine": row["engine"],
            "stride": row["stride"],
            "chunk": row["chunk"],
            "ingest_fps": 30,
            "worst_frame_lag_ms": round(fill_ms + row["ms_per_chunk"], 1),
        }
        print(json.dumps(row2), flush=True)


if __name__ == "__main__":
    main()
