"""Temporal tubelet rescoring.

Reference parity: the rescoring stage (SURVEY.md §2.2, §3.3): map detections
onto tracks via IoU, compute per-(track, class) score statistics over the
tubelet (top-k mean / max), and re-rank — detections on high-statistic
tubelets are boosted, detections on no tubelet optionally decayed. Emits the
``score_proto`` (track_proto + per-class tubelet scores) and a rescored
det_proto for the downstream suppression stage.

TPU design: one jitted program — the (K tracks × T frames × N dets) IoU
tensor, masked max-matching, and the top-k segment reduction over the frame
axis are all dense static-shape ops.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.geometry.boxes import pairwise_iou
from vdetlib_tpu.protos.accessors import (
    frame_ids as get_frame_ids,
    score_proto_from_track_proto,
)
from vdetlib_tpu.protos.arrays import (
    arrays_to_det_proto,
    det_proto_to_arrays,
    track_cls_scores_to_arrays,
    track_proto_to_arrays,
)
from vdetlib_tpu.utils.log import StageMetrics


@dataclass(frozen=True)
class RescoreOptions:
    match_thresh: float = 0.5  # det ↔ track-box IoU match
    top_ratio: float = 0.5  # statistic = mean of the top this-fraction scores
    boost: str = "max"  # det new score: max(score, stat) | "mean"
    bg_decay: float = 1.0  # multiplier for dets on no tubelet (1.0 = keep)
    # track-quality gate: a track must have IoU-matched detections on at
    # least this fraction of its live frames for its tubelet statistic to
    # boost/inject anything. Tracks latched onto flickering distractors
    # match only on flicker-on frames (low fraction); real objects match on
    # most frames outside occlusion windows. 0.0 = gate off (default).
    # Matched dets on a distrusted track keep their raw scores (no boost)
    # but still count as on-track — bg_decay never punishes a real det for
    # its track's quality.
    min_matched_frac: float = 0.0
    # length prior on the tubelet statistic: the top-k mean's DENOMINATOR is
    # at least this many frames, so a track shorter than stat_floor/top_ratio
    # live frames has its statistic proportionally damped. Rationale: k
    # scales with live length, so a 3-frame flickering-distractor track gets
    # k=2 and a HIGHER statistic than a 30-frame real track with occasional
    # dips — the statistic rewarded short consistent flickers, and
    # min_matched_frac cannot catch them (they match on most of their short
    # life). 0 = off.
    stat_floor: int = 0
    max_boxes: int = 64
    num_classes: int = 31
    max_tracks: int = 64
    # T-CNN tubelet-box semantics (SURVEY.md §2.2 perturbation row, §3.2):
    # track boxes become detections. Injection is INTERIOR gap-filling: a
    # live track box with NO IoU-matched detection at its frame enters the
    # det set scored by the tubelet's per-class statistic, but only when
    # matched frames exist on BOTH sides (a real occlusion window/dropout).
    # Extrapolation past the last matched frame is excluded — that is where
    # drifting/distractor tracks produce phantom boxes (measured: without
    # the interior gate, injection LOWERED hard-tier mAP 0.631 → 0.529).
    tubelet_boxes: bool = False


@functools.partial(jax.jit, static_argnames=("top_ratio", "boost"))
def rescore_arrays(
    det_boxes,  # (T, N, 4)
    det_scores,  # (T, N, C)
    det_mask,  # (T, N)
    trk_boxes,  # (K, T, 4)
    trk_mask,  # (K, T)
    match_thresh,
    bg_decay,
    top_ratio: float = 0.5,
    boost: str = "max",
    trk_cls_scores=None,  # optional (K, T, C) per-track-box class scores
    min_matched_frac=0.0,  # track-quality gate (RescoreOptions)
    stat_floor=0.0,  # length prior on the statistic (RescoreOptions)
):
    """Core rescoring math.

    ``trk_cls_scores`` carries per-track-box detector evidence (the perturb
    stage's max-pooled scores — video/perturb.py); it enters the tubelet
    statistic alongside the IoU-matched detection scores, so a tubelet whose
    perturbed boxes score well boosts its detections even where no raw
    detection matched.

    Returns:
      new_scores: (T, N, C) rescored detection scores.
      tubelet_stats: (K, C) per-track per-class statistics.
      matched_any: (K, T) bool — track k has an IoU-matched det at frame t
        (False on live frames = the gaps tubelet-box injection fills).
    """
    T, N, C = det_scores.shape
    K = trk_boxes.shape[0]
    # IoU between each track's box and each det, per frame: (T, K, N)
    iou = jax.vmap(pairwise_iou)(jnp.swapaxes(trk_boxes, 0, 1), det_boxes)
    match = (
        (iou > match_thresh)
        & det_mask[:, None, :]
        & jnp.swapaxes(trk_mask, 0, 1)[:, :, None]
    )  # (T, K, N)

    # per (track, frame, class): best matched det score
    per_tf = jnp.max(
        jnp.where(match[..., None], det_scores[:, None, :, :], 0.0), axis=2
    )  # (T, K, C)
    per_tf = jnp.swapaxes(per_tf, 0, 1)  # (K, T, C)
    if trk_cls_scores is not None:
        per_tf = jnp.maximum(
            per_tf, trk_cls_scores * trk_mask[..., None]
        )

    # top-k mean over the tubelet's frames (k = ceil(top_ratio * live length))
    live = jnp.sum(trk_mask, axis=1)  # (K,)
    k_each = jnp.maximum(jnp.ceil(live * top_ratio), 1.0)  # (K,)
    sorted_scores = jnp.sort(per_tf, axis=1)[:, ::-1, :]  # desc over T
    ranks = jnp.arange(T, dtype=jnp.float32)[None, :, None]
    topk_mask = ranks < k_each[:, None, None]
    stats = jnp.sum(sorted_scores * topk_mask, axis=1) / jnp.maximum(
        jnp.sum(topk_mask, axis=1), jnp.maximum(stat_floor, 1.0)
    )  # (K, C) — denominator floored at stat_floor (length prior)

    # track-quality gate: zero the statistic of tracks whose boxes rarely
    # match a detection (flickering-distractor signature) — they neither
    # boost nor (downstream) inject; their matched dets keep raw scores.
    matched_count = jnp.sum(jnp.any(match, axis=2), axis=0)  # (K,)
    matched_frac = matched_count / jnp.maximum(live, 1.0)  # (K,)
    good = matched_frac >= min_matched_frac  # (K,) — trivially True at 0.0
    stats = stats * good[:, None]

    # map stats back: each det takes the best stat among tracks matching it
    stat_per_det = jnp.max(
        jnp.where(match[..., None], jnp.swapaxes(stats[:, None, :], 0, 1)[:, :, None, :], 0.0),
        axis=1,
    )  # (T, N, C)
    on_track = jnp.any(match, axis=1)  # (T, N)
    if boost == "max":
        boosted = jnp.maximum(det_scores, stat_per_det)
    else:
        boosted = 0.5 * (det_scores + jnp.maximum(det_scores, stat_per_det))
    new_scores = jnp.where(
        on_track[..., None], boosted, det_scores * bg_decay
    )
    new_scores = new_scores * det_mask[..., None]
    matched_any = jnp.swapaxes(jnp.any(match, axis=2), 0, 1)  # (K, T)
    return new_scores, stats, matched_any


def tubelet_rescore(
    vid_proto: dict,
    det_proto: dict,
    track_proto: dict,
    opts: RescoreOptions = RescoreOptions(),
) -> tuple[dict, dict]:
    """Full rescoring stage → (score_proto, rescored det_proto)."""
    metrics = StageMetrics("rescore")
    fids = get_frame_ids(vid_proto)
    det_boxes, det_scores, det_mask = det_proto_to_arrays(
        det_proto, fids, opts.max_boxes, opts.num_classes
    )
    trk_boxes, _, trk_mask = track_proto_to_arrays(
        track_proto, fids, max_tracks=opts.max_tracks
    )
    trk_cls, has_perturb = track_cls_scores_to_arrays(
        track_proto, fids, opts.num_classes, max_tracks=opts.max_tracks
    )
    if trk_boxes.shape[0] == 0:
        trk_boxes = np.zeros((1, len(fids), 4), np.float32)
        trk_mask = np.zeros((1, len(fids)), bool)
    new_scores, stats, matched_any = rescore_arrays(
        jnp.asarray(det_boxes),
        jnp.asarray(det_scores),
        jnp.asarray(det_mask),
        jnp.asarray(trk_boxes),
        jnp.asarray(trk_mask),
        opts.match_thresh,
        opts.bg_decay,
        top_ratio=opts.top_ratio,
        boost=opts.boost,
        trk_cls_scores=jnp.asarray(trk_cls) if has_perturb else None,
        min_matched_frac=opts.min_matched_frac,
        stat_floor=float(opts.stat_floor),
    )
    new_scores = np.asarray(new_scores)
    stats = np.asarray(stats)
    matched_any = np.asarray(matched_any)

    out_boxes, out_scores, out_mask = det_boxes, new_scores, det_mask
    if opts.tubelet_boxes:
        # gap-filling injection: live unmatched track boxes append as det
        # slots (AFTER the det slots — the downstream link stage's
        # file-order budget sees dets first, exactly like the fused path's
        # rank compaction)
        K = trk_boxes.shape[0]
        C = new_scores.shape[-1]
        T = len(fids)
        # interior gaps only: matched frames must exist on both sides
        has_before = np.cumsum(matched_any, axis=1) > 0
        has_after = np.flip(
            np.cumsum(np.flip(matched_any, axis=1), axis=1), axis=1
        ) > 0
        inj_valid = (
            trk_mask
            & ~matched_any
            & has_before
            & has_after
            & (stats[:, 1:].max(axis=1) > 0)[:, None]
        )  # (K, T)
        inj_scores = (
            np.broadcast_to(stats[:, None, :], (K, T, C))
            * inj_valid[..., None]
        ).astype(np.float32)
        out_boxes = np.concatenate(
            [det_boxes, np.swapaxes(trk_boxes, 0, 1)], axis=1
        )
        out_scores = np.concatenate(
            [new_scores, np.swapaxes(inj_scores, 0, 1)], axis=1
        )
        out_mask = np.concatenate([det_mask, inj_valid.T], axis=1)

    det_out = arrays_to_det_proto(
        out_boxes, out_scores, out_mask, fids, vid_proto["video"], score_thresh=0.0
    )
    n_tracks = len(track_proto["tracks"])
    per_track_stats = [
        {c: float(stats[k, c]) for c in range(1, opts.num_classes) if stats[k, c] > 0}
        for k in range(min(n_tracks, opts.max_tracks))
    ] + [{} for _ in range(max(0, n_tracks - opts.max_tracks))]
    score_proto = score_proto_from_track_proto(track_proto, per_track_stats)
    metrics.set("frames", len(fids))
    metrics.set("tracks", n_tracks)
    metrics.finish()
    return score_proto, det_out
