"""Probe: snippets-per-dispatch V at the current (post-quarter-res-flow) mix.

Round 2 measured V=8 worse than V=4 at the old dispatch mix; the flow block
has since shrunk 8×, so re-probe. Interleaved in ONE process; reports
frames/sec at each V.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import A, B, C, H, R, T, W, build_inputs

REPS = 8
VS = (4, 8)


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
    cfg = FusedConfig(
        image_hw=(H, W), detect_batch=B, feat_batch=B,
        anchors_per_round=A, max_tracks=A, max_paths=32,
    )
    pipeline = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)

    vmax = max(VS)
    all_frames, all_rois = [], []
    for v in range(vmax):
        f, r = build_inputs(seed=v)
        all_frames.append(f)
        all_rois.append(r)
    frames_j = jnp.asarray(np.stack(all_frames))
    rois_j = jnp.asarray(np.stack(all_rois))

    runs = {}
    for V in VS:
        @jax.jit
        def run(det_p, trk_p, frames_v, rois_v):
            out = jax.vmap(lambda f, r: pipeline(det_p, trk_p, f, r))(
                frames_v, rois_v
            )
            return (
                jnp.sum(out.final_scores) + jnp.sum(out.det_scores)
                + jnp.sum(out.tubelet_stats) + jnp.sum(out.track_conf)
            )

        args = (det_params, trk_params, frames_j[:V], rois_j[:V])
        float(run(*args))
        runs[V] = (run, args)

    times = {V: [] for V in VS}
    for _ in range(REPS):
        for V, (run, args) in runs.items():
            t0 = time.perf_counter()
            float(run(*args))
            times[V].append(time.perf_counter() - t0)
    import statistics

    for V in VS:
        dt = min(times[V])
        dmed = statistics.median(times[V])
        print(
            f"V={V}: min {dt * 1e3:7.1f} ms/dispatch ({V * T / dt:7.1f} fps), "
            f"median {dmed * 1e3:7.1f} ms ({V * T / dmed:7.1f} fps)"
        )


if __name__ == "__main__":
    main()
