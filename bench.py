"""End-to-end benchmark — full T-CNN pipeline frames/sec on one chip.

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Workload (BASELINE.json configs 2-5): a synthetic VID-like snippet at
240×320 through detection (base detector over MXU), per-frame per-class NMS,
optical-flow MGP, correlation tracking (8 anchors, fwd+bwd scans), tubelet
rescoring, and per-class seq-NMS linking — fused into ONE jitted device
program returning a scalar checksum. Timing fetches that scalar to the host:
on this TPU terminal ``block_until_ready`` does not actually block, so the
host-side fetch is the only sound fence. vs_baseline is against the contract
target of 1000 frames/sec/chip (BASELINE.json:5 — the reference published no
numbers and ran O(seconds/frame) on K40-era GPUs, SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# ---- workload config ------------------------------------------------------
T = 128  # frames per snippet
H, W = 240, 320
R = 64  # proposals per frame
C = 31  # classes incl. background
B = 16  # detection batch
A = 8  # tracked anchors
TARGET_FPS = 1000.0
REPS = 5


def build_inputs(seed=0):
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
            [x1, y1, np.minimum(x1 + w, W - 1), np.minimum(y1 + h, H - 1)], axis=1
        )
    return sv.frames, rois


def main():
    from vdetlib_tpu.geometry.boxes import apply_deltas, clip_boxes, shift_boxes
    from vdetlib_tpu.kernels.flow import flow_video, mean_flow_in_boxes
    from vdetlib_tpu.kernels.nms import batched_nms
    from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
    from vdetlib_tpu.nn.detector import init_detector, preprocess_images
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.video.rescore import rescore_arrays
    from vdetlib_tpu.video.track import init_tracker, track_batch

    frames_np, rois_np = build_inputs()

    det_cfg = detector_preset("base", num_classes=C)
    det_model, det_params = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=(H, W), seed=0)

    @jax.jit
    def pipeline(det_p, trk_p, frames, rois):
        # ---- detection: backbone + ROI head over all frames (config 2) ----
        def one_batch(fr, rs):
            images = preprocess_images(fr, det_cfg)
            scores, deltas = det_model.apply(det_p, images, rs, train=False)
            probs = jax.nn.softmax(scores, axis=-1)
            boxes = clip_boxes(apply_deltas(rs[:, :, None, :], deltas), H, W)
            return probs, boxes

        fr_b = frames.reshape(T // B, B, H, W, 3)
        rs_b = rois.reshape(T // B, B, R, 4)
        probs, boxes = jax.lax.map(lambda ab: one_batch(*ab), (fr_b, rs_b))
        probs = probs.reshape(T, R, C)
        boxes = boxes.reshape(T, R, C, 4)

        # ---- per-frame per-class NMS (config 1 kernel) ----
        cls_boxes = jnp.swapaxes(boxes[:, :, 1:, :], 1, 2)  # (T, C-1, R, 4)
        cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2)  # (T, C-1, R)
        valid = cls_scores > 0.01
        keep = batched_nms(cls_boxes, cls_scores, valid, 0.3)
        kept_scores = jnp.where(keep, cls_scores, 0.0)

        # ---- MGP: half-res flow + one-hop box shift (config 4a) ----
        flow = flow_video(frames, preset="fast", upsample=False)
        det_mask = jnp.any(keep, axis=1)  # (T, R)
        shifts = jax.vmap(mean_flow_in_boxes)(
            flow, rois[:-1] * 0.5, det_mask[:-1]
        )  # full-res px on the half-res grid
        prop_boxes = shift_boxes(rois[:-1], shifts)

        # ---- tracking: top-A anchors at frame 0, fwd+bwd scans (config 3) --
        x = frames.astype(jnp.float32) / 255.0 - 0.5
        feats = trk_model.apply(trk_p, x)
        anchor_quality = jnp.max(probs[0, :, 1:], axis=-1)  # (R,)
        _, anchor_idx = jax.lax.top_k(anchor_quality, A)
        anchor_boxes = rois[0][anchor_idx]
        trk_boxes, trk_conf, trk_alive = track_batch(
            trk_model, trk_cfg, feats, jnp.zeros(A, jnp.int32), anchor_boxes, 0.3
        )

        # ---- tubelet rescoring (config 4b) ----
        new_scores, stats = rescore_arrays(
            rois,
            jnp.swapaxes(kept_scores, 1, 2),  # (T, R, C-1)
            det_mask,
            trk_boxes,
            trk_alive,
            0.5,
            1.0,
        )

        # ---- seq-NMS linking over all classes (config 5) ----
        seq_scores, _ = seq_nms_batch(
            rois,
            jnp.swapaxes(new_scores, 0, 2).swapaxes(1, 2),  # (C-1, T, R)
            jnp.swapaxes(keep, 0, 1),
            0.5,
            0.3,
            max_paths=32,
        )

        return (
            jnp.sum(seq_scores)
            + jnp.sum(prop_boxes)
            + jnp.sum(stats)
            + jnp.sum(trk_conf)
        )

    frames_j = jnp.asarray(frames_np)
    rois_j = jnp.asarray(rois_np)

    # compile + warm
    float(pipeline(det_params, trk_params, frames_j, rois_j))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(pipeline(det_params, trk_params, frames_j, rois_j))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    fps = T / dt
    print(
        json.dumps(
            {
                "metric": "e2e_pipeline_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
