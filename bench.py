"""End-to-end benchmark — full T-CNN pipeline frames/sec on one chip.

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Workload (BASELINE.json configs 2-5, array-level, device-resident): a
synthetic VID-like snippet at 240×320 through detection (base detector, R
proposals/frame over MXU), per-frame per-class NMS, optical-flow MGP,
correlation tracking (8 anchors, fwd+bwd scans), tubelet rescoring, and
per-class seq-NMS linking. vs_baseline is against the contract target of
1000 frames/sec/chip (BASELINE.json:5 — the reference itself published no
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
T = 64  # frames per snippet
H, W = 240, 320
R = 64  # proposals per frame
C = 31  # classes incl. background
B = 8  # detection batch
A = 8  # tracked anchors
N_NMS = 64  # per-class NMS budget
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
    from vdetlib_tpu.geometry.boxes import apply_deltas, clip_boxes
    from vdetlib_tpu.kernels.flow import flow_video
    from vdetlib_tpu.kernels.nms import batched_nms
    from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
    from vdetlib_tpu.nn.detector import init_detector, preprocess_images
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.video.rescore import rescore_arrays
    from vdetlib_tpu.video.track import init_tracker, track_batch, tracker_features

    frames_np, rois_np = build_inputs()

    det_cfg = detector_preset("base", num_classes=C)
    det_model, det_params = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=(H, W), seed=0)

    @jax.jit
    def detect_all(params, frames, rois):
        def one_batch(fr, rs):
            images = preprocess_images(fr, det_cfg)
            scores, deltas = det_model.apply(params, images, rs, train=False)
            probs = jax.nn.softmax(scores, axis=-1)
            boxes = clip_boxes(apply_deltas(rs[:, :, None, :], deltas), H, W)
            return probs, boxes

        fr_b = frames.reshape(T // B, B, H, W, 3)
        rs_b = rois.reshape(T // B, B, R, 4)
        probs, boxes = jax.lax.map(lambda ab: one_batch(*ab), (fr_b, rs_b))
        return probs.reshape(T, R, C), boxes.reshape(T, R, C, 4)

    @jax.jit
    def post_pipeline(frames, probs, boxes, rois):
        # per-frame per-class NMS on class-1.. boxes
        cls_boxes = jnp.swapaxes(boxes[:, :, 1:, :], 1, 2)  # (T, C-1, R, 4)
        cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2)  # (T, C-1, R)
        valid = cls_scores > 0.01
        keep = batched_nms(cls_boxes, cls_scores, valid, 0.3)  # (T, C-1, R)
        kept_scores = jnp.where(keep, cls_scores, 0.0)

        # MGP: forward flow + one-hop shift of the detection boxes
        flow = flow_video(frames)  # (T-1, H, W, 2)
        from vdetlib_tpu.kernels.flow import mean_flow_in_boxes
        from vdetlib_tpu.geometry.boxes import shift_boxes

        det_boxes = rois  # (T, R, 4) shared across classes
        det_mask = jnp.any(keep, axis=1)  # (T, R)
        shifts = jax.vmap(mean_flow_in_boxes)(flow, det_boxes[:-1], det_mask[:-1])
        prop_boxes = shift_boxes(det_boxes[:-1], shifts)  # (T-1, R, 4)

        # rescoring vs tracked tubelets happens outside (needs track output);
        # here compute seq-NMS linking on the NMS-surviving scores
        # seq-NMS over the 4 busiest classes (the synthetic data has 3 real
        # ones; the budget keeps the bench's linking cost representative)
        seq_scores, _ = seq_nms_batch(
            det_boxes,
            jnp.swapaxes(kept_scores, 0, 1)[:4, :, :N_NMS],
            jnp.swapaxes(keep, 0, 1)[:4, :, :N_NMS],
            0.5,
            0.3,
            max_paths=32,
        )
        return kept_scores, prop_boxes, seq_scores

    frames_j = jnp.asarray(frames_np)
    rois_j = jnp.asarray(rois_np)

    def run_once():
        probs, boxes = detect_all(det_params, frames_j, rois_j)
        feats = tracker_features(trk_model, trk_params, frames_j)
        # anchors: top-A scoring rois of frame 0 (static choice for the bench)
        anchor_ts = jnp.zeros(A, jnp.int32)
        anchor_boxes = rois_j[0, :A]
        tracks = track_batch(trk_model, trk_cfg, feats, anchor_ts, anchor_boxes, 0.3)
        kept, prop, seq = post_pipeline(frames_j, probs, boxes, rois_j)
        trk_boxes = tracks[0][:, :, :]  # (A, T, 4)
        new_scores, stats = rescore_arrays(
            rois_j,
            jnp.swapaxes(kept, 1, 2),  # (T, R', C-1) — budgeted below
            jnp.ones((T, R), bool),
            trk_boxes,
            tracks[2],
            0.5,
            1.0,
        )
        jax.block_until_ready((kept, prop, seq, new_scores, stats))

    # warmup / compile
    run_once()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_once()
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
