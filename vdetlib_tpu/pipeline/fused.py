"""Fused device pipeline — the whole T-CNN flow as ONE jitted program.

The staged runner (pipeline/runner.py) preserves the reference's
JSON-protos-at-every-boundary contract; this module is the production serving
path: detection → per-class NMS → optical-flow MGP → correlation tracking →
tubelet rescoring → seq-NMS linking compiled into a single XLA program, so a
whole snippet is processed device-resident with one dispatch (>1000
frames/sec/chip on TPU v5 lite — see bench.py, which wraps this).

Multi-chip: :func:`make_sharded_pipeline` shards a batch of snippets along a
mesh's ``data`` axis (video-level data parallelism over ICI — SURVEY.md §5.8);
params are replicated, collectives are only needed for metric reductions.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vdetlib_tpu.geometry.boxes import apply_deltas, clip_boxes, shift_boxes
from vdetlib_tpu.kernels.flow import flow_video, mean_flow_in_boxes
from vdetlib_tpu.kernels.nms import batched_nms
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.nn.detector import preprocess_images
from vdetlib_tpu.video.rescore import rescore_arrays
from vdetlib_tpu.video.track import track_batch


@dataclass(frozen=True)
class FusedConfig:
    image_hw: tuple = (240, 320)
    detect_batch: int = 16
    num_anchors: int = 8
    nms_thresh: float = 0.3
    score_floor: float = 0.01
    track_conf: float = 0.3
    rescore_match: float = 0.5
    link_thresh: float = 0.5
    suppress_thresh: float = 0.3
    max_paths: int = 32
    flow_preset: str = "fast"


class FusedOutput(NamedTuple):
    probs: jax.Array  # (T, R, C) raw detector probabilities
    keep: jax.Array  # (T, C-1, R) NMS survivors
    final_scores: jax.Array  # (C-1, T, R) seq-NMS rescored (-1 = suppressed)
    path_ids: jax.Array  # (C-1, T, R)
    prop_boxes: jax.Array  # (T-1, R, 4) MGP-propagated boxes
    track_boxes: jax.Array  # (A, T, 4)
    track_conf: jax.Array  # (A, T)
    track_alive: jax.Array  # (A, T)
    tubelet_stats: jax.Array  # (A, C-1)


def _make_pipeline_fn(det_model, trk_model, trk_cfg, cfg: FusedConfig):
    H, W = cfg.image_hw
    B = cfg.detect_batch
    A = cfg.num_anchors

    def pipeline(det_p, trk_p, frames, rois, t_valid=None) -> FusedOutput:
        T, R = rois.shape[:2]
        C = det_model.config.num_classes
        # variable-length snippets: T is a padded bucket; frames beyond
        # t_valid are masked out of every decision (bucketed compilation —
        # one executable per bucket instead of one per video length)
        frame_ok = (
            jnp.ones((T,), bool)
            if t_valid is None
            else jnp.arange(T) < t_valid
        )

        # ---- detection (config 2) ----
        def one_batch(fr, rs):
            images = preprocess_images(fr, det_model.config)
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
        valid = (cls_scores > cfg.score_floor) & frame_ok[:, None, None]
        keep = batched_nms(cls_boxes, cls_scores, valid, cfg.nms_thresh)
        kept_scores = jnp.where(keep, cls_scores, 0.0)
        det_mask = jnp.any(keep, axis=1)  # (T, R)

        # ---- MGP (config 4a) ----
        flow = flow_video(frames, preset=cfg.flow_preset, upsample=False)
        scale = 0.5 if cfg.flow_preset == "fast" else 1.0
        shifts = jax.vmap(mean_flow_in_boxes)(flow, rois[:-1] * scale, det_mask[:-1])
        prop_boxes = shift_boxes(rois[:-1], shifts)

        # ---- tracking (config 3) ----
        x = frames.astype(jnp.float32) / 255.0 - 0.5
        feats = trk_model.apply(trk_p, x)
        # global top-A anchors over ALL frames (the reference's greedy anchor
        # selection picks the globally highest-scoring detections)
        quality = jnp.max(jnp.where(keep, cls_scores, 0.0), axis=1)  # (T, R)
        _, flat_idx = jax.lax.top_k(quality.reshape(-1), A)
        anchor_ts = (flat_idx // R).astype(jnp.int32)
        anchor_boxes = rois.reshape(-1, 4)[flat_idx]
        trk_boxes, trk_conf, trk_alive = track_batch(
            trk_model, trk_cfg, feats, anchor_ts, anchor_boxes, cfg.track_conf
        )
        trk_alive = trk_alive & frame_ok[None, :]

        # ---- tubelet rescoring (config 4b) ----
        new_scores, stats = rescore_arrays(
            rois,
            jnp.swapaxes(kept_scores, 1, 2),
            det_mask,
            trk_boxes,
            trk_alive,
            cfg.rescore_match,
            1.0,
        )

        # ---- seq-NMS linking (config 5) ----
        final_scores, path_ids = seq_nms_batch(
            rois,
            jnp.swapaxes(new_scores, 0, 2).swapaxes(1, 2),  # (C-1, T, R)
            jnp.swapaxes(keep, 0, 1),
            cfg.link_thresh,
            cfg.suppress_thresh,
            max_paths=cfg.max_paths,
        )
        return FusedOutput(
            probs, keep, final_scores, path_ids, prop_boxes,
            trk_boxes, trk_conf, trk_alive, stats,
        )

    return pipeline


def make_fused_pipeline(det_model, trk_model, trk_cfg, cfg: FusedConfig):
    """Returns jit(fn)(det_params, trk_params, frames_u8 (T,H,W,3), rois (T,R,4),
    t_valid=None) — t_valid masks padded tail frames (see pad_snippet)."""
    return jax.jit(_make_pipeline_fn(det_model, trk_model, trk_cfg, cfg))


def pad_snippet(frames_u8, rois, bucket: int = 32):
    """Pad a (T, ...) snippet to the next T bucket (repeat last frame).

    Returns (frames_p, rois_p, t_valid). One compiled executable serves every
    video whose length rounds to the same bucket.
    """
    import numpy as np

    T = frames_u8.shape[0]
    Tp = max(((T + bucket - 1) // bucket) * bucket, bucket)
    if Tp == T:
        return frames_u8, rois, T
    fpad = np.repeat(frames_u8[-1:], Tp - T, axis=0)
    rpad = np.zeros((Tp - T,) + rois.shape[1:], rois.dtype)
    return (
        np.concatenate([frames_u8, fpad], axis=0),
        np.concatenate([rois, rpad], axis=0),
        T,
    )


def make_sharded_pipeline(det_model, trk_model, trk_cfg, cfg: FusedConfig, mesh):
    """Data-parallel fused pipeline over a mesh: snippets shard along 'data'.

    Returns fn(det_params, trk_params, frames (V,T,H,W,3), rois (V,T,R,4))
    with V divisible by the mesh's data-axis size. Params replicate; each
    device runs whole snippets (per-video state never crosses chips —
    SURVEY.md §5.7/5.8).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    single = _make_pipeline_fn(det_model, trk_model, trk_cfg, cfg)
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, data_sharding, data_sharding),
        out_shardings=data_sharding,
    )
    def sharded(det_p, trk_p, frames_v, rois_v):
        return jax.vmap(lambda f, r: single(det_p, trk_p, f, r))(frames_v, rois_v)

    return sharded
