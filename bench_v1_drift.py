"""V=1 vs V=4 interleaved re-measure (VERDICT r4 item 7).

Strict-parity V=1 throughput drifted 1917 -> 1824 fps r3->r4 in the
driver-captured numbers while the V=4 headline stayed flat. This script
decides noise-vs-regression the only way this tunnel allows (RESULTS.md
records 5x cross-window swings): build BOTH executables once, then measure
them INTERLEAVED for 3 rounds (min-of-5 fetch-fenced reps per round), so
any tunnel-weather drift hits both alike. Prints one JSON line per round
plus a summary. Run on the chip: python bench_v1_drift.py
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def main():
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.fused import FusedConfig, make_fused_pipeline
    from vdetlib_tpu.video.track import init_tracker

    T, H, W, R, C, A, V = B.T, B.H, B.W, B.R, B.C, B.A, B.V
    det_cfg = detector_preset("base", num_classes=C)
    det_model, det_p = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
    cfg = FusedConfig(
        image_hw=(H, W), detect_batch=B.B, feat_batch=B.B,
        anchors_per_round=A, max_tracks=A, max_paths=32,
        # default 1 here (NOT the production default 2): the r3/r4 numbers
        # this script adjudicates were measured at stride 1 — like-for-like.
        track_stride=int(os.environ.get("V1DRIFT_TRACK_STRIDE", "1")),
    )
    pipeline = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)

    def checksum(out):
        return (
            jnp.sum(out.final_scores) + jnp.sum(out.det_scores)
            + jnp.sum(out.tubelet_stats) + jnp.sum(out.track_conf)
        )

    @jax.jit
    def run4(dp, tp, fv, rv):
        return checksum(jax.vmap(lambda f, r: pipeline(dp, tp, f, r))(fv, rv))

    @jax.jit
    def run1(dp, tp, f, r):
        return checksum(pipeline(dp, tp, f, r))

    packs = [B.build_inputs(seed=v) for v in range(V)]
    frames_j = jnp.asarray(np.stack([p[0] for p in packs]))
    rois_j = jnp.asarray(np.stack([p[1] for p in packs]))

    float(run4(det_p, trk_p, frames_j, rois_j))
    float(run1(det_p, trk_p, frames_j[0], rois_j[0]))

    def meas(fn, *a, reps=5):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    v1s, v4s = [], []
    for rnd in range(3):
        dt1 = meas(run1, det_p, trk_p, frames_j[0], rois_j[0])
        dt4 = meas(run4, det_p, trk_p, frames_j, rois_j)
        v1s.append(T / dt1)
        v4s.append(V * T / dt4)
        print(json.dumps({
            "round": rnd, "v1_fps": round(T / dt1, 2),
            "v4_fps": round(V * T / dt4, 2),
            "v1_ms": round(dt1 * 1e3, 2), "v4_ms": round(dt4 * 1e3, 2),
        }), flush=True)
    print(json.dumps({
        "v1_best": round(max(v1s), 2), "v1_spread": round(max(v1s) - min(v1s), 2),
        "v4_best": round(max(v4s), 2), "v4_spread": round(max(v4s) - min(v4s), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
