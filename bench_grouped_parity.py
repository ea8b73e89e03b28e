"""Quantify grouped-dispatch divergence (VERDICT r2 weak #1).

The fused engine's ``group_size > 1`` vmaps the single-video pipeline over a
group of snippets; XLA compiles the vmapped program separately, so its bf16
conv math reassociates differently and near-tied NMS/threshold decisions can
flip relative to the single-video executable. This script MEASURES that over
N seeds at the bench configuration:

- keep-decision flips: slots where exactly one of (single, grouped) has a
  surviving final seq-NMS score;
- score drift on slots both keep;
- box drift on slots both keep.

Run on the TPU (one process at a time); results go to RESULTS.md.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

T, H, W, R, C, B, A = 64, 240, 320, 64, 31, 32, 8
V = 4  # group size under test (the bench default)
N_GROUPS = 4  # seeds = V * N_GROUPS videos


def build_inputs(seed):
    from vdetlib_tpu.data.synth import SynthConfig, make_video

    sv = make_video(
        SynthConfig(num_frames=T, height=H, width=W, num_classes=4, seed=seed)
    )
    rng = np.random.default_rng(seed)
    rois = np.zeros((T, R, 4), np.float32)
    for t in range(T):
        x1 = rng.uniform(0, W - 20, R)
        y1 = rng.uniform(0, H - 20, R)
        w = rng.uniform(16, 120, R)
        h = rng.uniform(16, 120, R)
        rois[t] = np.stack(
            [x1, y1, np.minimum(x1 + w, W - 1), np.minimum(y1 + h, H - 1)],
            axis=1,
        )
    return sv.frames, rois


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
    pipe = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)
    vpipe = jax.jit(jax.vmap(lambda f, r: pipe(det_params, trk_params, f, r)))

    flips = kept_both = total = 0
    max_sd = max_bd = 0.0
    track_count_mismatch = 0
    for g in range(N_GROUPS):
        frames = []
        rois = []
        for v in range(V):
            f, r = build_inputs(seed=100 + g * V + v)
            frames.append(f)
            rois.append(r)
        frames_j = jnp.asarray(np.stack(frames))
        rois_j = jnp.asarray(np.stack(rois))
        out_g = vpipe(frames_j, rois_j)
        for v in range(V):
            out_s = pipe(det_params, trk_params, frames_j[v], rois_j[v])
            fs_s = np.asarray(out_s.final_scores)
            fs_g = np.asarray(jax.tree.map(lambda x: x[v], out_g).final_scores)
            live_s = fs_s > 0
            live_g = fs_g > 0
            flips += int((live_s != live_g).sum())
            both = live_s & live_g
            kept_both += int(both.sum())
            total += fs_s.size
            if both.any():
                max_sd = max(max_sd, float(np.abs(fs_s - fs_g)[both].max()))
            bx_s = np.asarray(out_s.det_boxes)
            bx_g = np.asarray(jax.tree.map(lambda x: x[v], out_g).det_boxes)
            m = np.asarray(out_s.det_mask) & np.asarray(
                jax.tree.map(lambda x: x[v], out_g).det_mask
            )
            if m.any():
                max_bd = max(
                    max_bd, float(np.abs(bx_s - bx_g)[m].max())
                )
            if int(out_s.n_tracks) != int(
                jax.tree.map(lambda x: x[v], out_g).n_tracks
            ):
                track_count_mismatch += 1

    n_videos = V * N_GROUPS
    print(f"videos compared: {n_videos} (groups of {V})")
    print(
        f"keep-decision flips: {flips} / {total} slots "
        f"({100.0 * flips / total:.4f}%), both-kept: {kept_both}"
    )
    print(f"max |score| drift on both-kept slots: {max_sd:.6f}")
    print(f"max |box| drift on both-masked slots: {max_bd:.4f} px")
    print(f"track-count mismatches: {track_count_mismatch} / {n_videos}")


if __name__ == "__main__":
    main()
