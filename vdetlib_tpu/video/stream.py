"""Streaming (online, chunked) video processing for arbitrarily long videos.

SURVEY.md §5.7: the frame axis is the sequence axis; long videos are
processed in fixed-size chunks with carried state across boundaries —
scan-over-chunks, the CNN-era analog of blockwise sequence processing.

Per chunk (one device dispatch each for detect/track):
- detection + per-frame per-class NMS (stateless);
- ONLINE tracking with carried state: active track slots carry
  (box, alive, template) across chunk boundaries; a chunk-level
  ``lax.scan`` advances all slots; new tracks are seeded from the chunk's
  top uncovered detections (host-side greedy, as in track_from_det).
  Streaming deviation from the batch tracker: forward-only (the future is
  unknown), like any online tracker.

After the last chunk, seq-NMS linking + rescoring run ONCE globally over the
collected (small) box/score arrays — exact, since linking needs only boxes
and scores, not frames.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.nn.tracker_net import extract_template
from vdetlib_tpu.utils.common import iou as np_iou
from vdetlib_tpu.utils.log import StageMetrics, get_logger
from vdetlib_tpu.video.detect import _detect_step
from vdetlib_tpu.video.track import ncc_update, tracker_features

log = get_logger("stream")


@dataclass(frozen=True)
class StreamOptions:
    chunk: int = 32  # frames per device dispatch
    max_rois: int = 64
    num_classes: int = 31
    track_slots: int = 16  # live track capacity (carried across chunks)
    seed_thresh: float = 0.4  # min det score to seed a new track
    cover_thresh: float = 0.5
    conf_thresh: float = 0.3  # track termination
    nms_thresh: float = 0.3
    link_thresh: float = 0.5
    suppress_thresh: float = 0.3
    max_paths: int = 64


@functools.partial(jax.jit, static_argnames=("cfg", "conf_thresh"))
def track_chunk(cfg, feats, templates, boxes0, alive0, conf_thresh: float):
    """Advance all track slots over one chunk of features.

    Args:
      feats: (Tc, h, w, C); templates: (A, P, P, C); boxes0: (A, 4);
      alive0: (A,) bool — state carried from the previous chunk.
    Returns:
      boxes (A, Tc, 4), conf (A, Tc), alive (A, Tc), plus the final
      (boxes_end, alive_end) carry.
    """

    def one_slot(template, box0, a0):
        def step(carry, feat_t):
            box, alive = carry
            new_box, peak = ncc_update(feat_t, box, template, cfg)
            ok = peak > conf_thresh
            new_alive = alive & ok
            new_box = jnp.where(new_alive, new_box, box)
            return (new_box, new_alive), (new_box, peak, new_alive)

        (box_end, alive_end), (boxes, conf, alive) = jax.lax.scan(
            step, (box0, a0), feats
        )
        return boxes, conf, alive, box_end, alive_end

    return jax.vmap(one_slot)(templates, boxes0, alive0)


def stream_video(
    det_model,
    det_params,
    trk_model,
    trk_params,
    trk_cfg,
    frame_chunks: Iterator[np.ndarray],
    rois_per_frame,
    opts: StreamOptions = StreamOptions(),
):
    """Process a stream of frame chunks; returns collected arrays + tracks.

    Args:
      frame_chunks: yields (Tc, H, W, 3) uint8 arrays, Tc == opts.chunk
        (last chunk may be shorter — pad on the caller side or here).
      rois_per_frame: callable (global_t) -> (R, 4) proposals, or a
        (T_total, R, 4) array.
    Returns:
      dict with per-frame detection arrays (boxes/scores/keep), seq-NMS
      scores + path ids, and per-slot track segments.
    """
    metrics = StageMetrics("stream")
    A = opts.track_slots
    R = opts.max_rois
    C = opts.num_classes
    P = trk_cfg.template_pool
    Cf = trk_cfg.out_features

    slot_templates = jnp.zeros((A, P, P, Cf), jnp.float32)
    slot_boxes = jnp.zeros((A, 4), jnp.float32)
    slot_alive = jnp.zeros((A,), bool)
    slot_id = -np.ones(A, np.int64)  # global track ids per slot
    next_track_id = 0

    all_boxes, all_scores, all_keep = [], [], []
    track_segments: dict[int, list] = {}
    t_global = 0

    from vdetlib_tpu.kernels.nms import batched_nms

    for chunk in frame_chunks:
        Tc = chunk.shape[0]
        pad = opts.chunk - Tc
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], axis=0)
        if callable(rois_per_frame):
            rois = np.stack(
                [rois_per_frame(t_global + i) for i in range(opts.chunk)]
            ).astype(np.float32)
        else:
            rois = np.zeros((opts.chunk, R, 4), np.float32)
            avail = rois_per_frame[t_global : t_global + Tc]
            rois[: len(avail)] = avail
        frames_j = jnp.asarray(chunk)
        rois_j = jnp.asarray(rois)

        # --- detection + NMS for this chunk ---
        probs, boxes = _detect_step(det_model, det_params, frames_j, rois_j, True)
        cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2)  # (Tc, C-1, R)
        cls_boxes = jnp.swapaxes(boxes[:, :, 1:, :], 1, 2)
        keep = batched_nms(cls_boxes, cls_scores, cls_scores > 0.01, opts.nms_thresh)

        # --- tracking: advance carried slots over this chunk ---
        feats = tracker_features(trk_model, trk_params, frames_j)
        tb, tc_, ta, box_end, alive_end = track_chunk(
            trk_cfg, feats, slot_templates, slot_boxes, slot_alive, opts.conf_thresh
        )
        slot_boxes, slot_alive = box_end, alive_end
        tb_np, ta_np, tc_np = np.asarray(tb), np.asarray(ta), np.asarray(tc_)
        for a in range(A):
            if slot_id[a] < 0:
                continue
            seg = track_segments.setdefault(int(slot_id[a]), [])
            for i in range(Tc):
                if ta_np[a, i]:
                    seg.append((t_global + i, tb_np[a, i], float(tc_np[a, i])))

        # --- seed new tracks from this chunk's top uncovered detections ---
        probs_np = np.asarray(probs)
        keep_np = np.asarray(keep)
        best_scores = np.where(
            np.moveaxis(keep_np, 1, 2), probs_np[:, :, 1:], 0.0
        ).max(axis=2)  # (Tc, R)
        flat = np.argsort(-best_scores.ravel(), kind="stable")
        free = [a for a in range(A) if not bool(np.asarray(slot_alive)[a])]
        seeded = []
        boxes_np = rois
        for fi in flat:
            if not free:
                break
            ti, ri = divmod(int(fi), R)
            if best_scores[ti, ri] < opts.seed_thresh:
                break  # sorted desc — everything after is below threshold
            if ti >= Tc:
                # padded frame: its rois are zero-boxes with arbitrary
                # detector scores — skip, but keep seeding real candidates
                continue
            cand = boxes_np[ti, ri]
            covered = False
            live_boxes = [tb_np[a, ti] for a in range(A) if ta_np[a, ti]]
            live_boxes += [boxes_np[tj, rj] for tj, rj in seeded if tj == ti]
            if live_boxes and np_iou(cand[None], np.stack(live_boxes)).max() > opts.cover_thresh:
                covered = True
            if covered:
                continue
            a = free.pop(0)
            template = extract_template(feats[ti], jnp.asarray(cand), trk_cfg)
            slot_templates = slot_templates.at[a].set(template)
            slot_boxes = slot_boxes.at[a].set(jnp.asarray(cand))
            slot_alive = slot_alive.at[a].set(True)
            slot_id[a] = next_track_id
            track_segments[next_track_id] = [
                (t_global + ti, cand.copy(), float(best_scores[ti, ri]))
            ]
            next_track_id += 1
            seeded.append((ti, ri))

        all_boxes.append(rois[:Tc])
        all_scores.append(np.asarray(cls_scores)[:Tc])
        all_keep.append(keep_np[:Tc])
        t_global += Tc

    # --- global seq-NMS over the collected (small) arrays ---
    boxes_full = np.concatenate(all_boxes, axis=0)  # (T, R, 4)
    scores_full = np.concatenate(all_scores, axis=0)  # (T, C-1, R)
    keep_full = np.concatenate(all_keep, axis=0)
    seq_scores, path_ids = seq_nms_batch(
        jnp.asarray(boxes_full),
        jnp.asarray(np.moveaxis(scores_full, 1, 0)),  # (C-1, T, R)
        jnp.asarray(np.moveaxis(keep_full, 1, 0)),
        opts.link_thresh,
        opts.suppress_thresh,
        max_paths=opts.max_paths,
    )
    metrics.set("frames", t_global)
    metrics.set("tracks", len(track_segments))
    metrics.finish()
    return {
        "boxes": boxes_full,
        "scores": scores_full,
        "keep": keep_full,
        "seq_scores": np.asarray(seq_scores),
        "path_ids": np.asarray(path_ids),
        "tracks": track_segments,
        "num_frames": t_global,
    }
