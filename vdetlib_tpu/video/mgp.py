"""Motion-guided propagation (MGP).

Reference parity: the MGP stage (SURVEY.md §2.2, §3.3): for each detection at
frame t, dense optical flow t→t±1..±w gives a mean flow vector inside the
box; the box shifted by that vector is copied (with its class scores) into
the neighboring frames, and a per-frame per-class NMS dedups the union of
native + propagated detections. Fills single-frame recall gaps.

TPU design: flow for ALL consecutive pairs (both directions) is one batched
device program (kernels/flow.py); each propagation hop is one vmapped
shift-by-mean-flow over the padded (T, N) detection arrays; successive hops
compose. The host only converts protos ⇄ arrays and assembles the output.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.loader import FrameLoader
from vdetlib_tpu.geometry.boxes import shift_boxes
from vdetlib_tpu.kernels.flow import (
    flow_coord_scale,
    flow_video,
    mean_flow_in_boxes,
)
from vdetlib_tpu.protos.accessors import frame_ids as get_frame_ids
from vdetlib_tpu.protos.arrays import arrays_to_det_proto, det_proto_to_arrays
from vdetlib_tpu.utils.log import StageMetrics
from vdetlib_tpu.video.frame_nms import frame_nms


@dataclass(frozen=True)
class MGPOptions:
    window: int = 1  # propagate to t±window
    score_decay: float = 0.9  # per-hop multiplicative decay on copied scores
    nms_thresh: float = 0.3  # dedup NMS threshold
    max_boxes: int = 64  # per-frame detection budget (pre-propagation)
    num_classes: int = 31
    flow_levels: int = 3
    flow_search: int = 3
    # "fast" (single half-res bf16 level) measured BETTER box-shift accuracy
    # than the 3-level pyramid on synthetic motion (0.38 vs 0.41 px mean) at
    # 4x the speed — the reduced-res cost volume smooths noise. "fastest"
    # (quarter res) is the production default: another 4x less level work
    # AND wider motion coverage (±20 vs ±10 full-res px), measured
    # quality-neutral end-to-end (hard-tier mAP 0.6509 vs 0.6488, box-shift
    # mean err <1.5px — RESULTS.md round 3). "accurate" (full 3-level
    # pyramid) remains for content needing sub-pixel flow.
    flow_preset: str = "fastest"
    image_hw: Optional[tuple] = None
    run_nms: bool = True


@functools.partial(jax.jit, static_argnames=("coord_scale",))
def _propagate_hop(flow_t, boxes_t, mask_t, coord_scale: float = 1.0):
    """One hop: boxes at t shifted by their mean flow → boxes for t+1.

    flow_t: (H*s, W*s, 2) flow grid whose VALUES are full-res pixels;
    boxes_t: (N, 4) full-res; mask_t: (N,). ``coord_scale`` maps box
    coordinates onto the flow grid (0.5 for the "fast" preset's half-res
    field — skipping the bilinear upsample + full-res integral images that
    dominated the MGP stage; box-mean shifts measured MORE accurate at
    half-res on synthetic motion, see MGPOptions.flow_preset note).
    """
    shift = mean_flow_in_boxes(flow_t, boxes_t * coord_scale, mask_t)  # (N, 2)
    return shift_boxes(boxes_t, shift)


def propagate_dets(
    frames_u8: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    mask: np.ndarray,
    opts: MGPOptions,
):
    """Pure-array MGP core.

    Args:
      frames_u8: (T, H, W, 3); boxes: (T, N, 4); scores: (T, N, C);
      mask: (T, N) bool.
    Returns:
      (boxes', scores', mask', origin_hop) with N' = N * (2*window + 1) —
      slot blocks [native, +1, ..., +w, -1, ..., -w].
    """
    T, N = mask.shape
    w = opts.window
    # reduced-res presets: consume the native flow grid directly (values are
    # full-res px; boxes scale by 1/pool onto the grid) — skips the bilinear
    # upsample and shrinks the integral-image work in mean_flow_in_boxes.
    coord_scale = flow_coord_scale(opts.flow_preset)
    flow_kw = dict(
        levels=opts.flow_levels, search=opts.flow_search,
        preset=opts.flow_preset, upsample=(coord_scale == 1.0),
    )
    frames_dev = jnp.asarray(frames_u8)
    fwd = flow_video(frames_dev, **flow_kw)  # (T-1, H, W, 2): t → t+1
    bwd = flow_video(jnp.flip(frames_dev, axis=0), **flow_kw)
    # reversed: index r maps rev r → r+1 i.e. orig (T-1-r) → (T-2-r)
    bwd = jnp.flip(bwd, axis=0)  # bwd[t] maps t+1 → t

    out_boxes = [boxes]
    out_scores = [scores]
    out_mask = [mask]
    hops = [np.zeros((T, N), np.int32)]

    # forward hops: after hop h the arrays are destination-aligned — slot t
    # holds the det propagated from frame t-h, currently sitting at frame t.
    cur_b, cur_m = jnp.asarray(boxes), jnp.asarray(mask)
    for h in range(1, w + 1):
        # cur_b[t] sits at frame t; fwd[t] maps t → t+1; prepend zeros to
        # re-align at the destination.
        nb = jax.vmap(lambda f, b, m: _propagate_hop(f, b, m, coord_scale))(
            fwd, cur_b[:-1], cur_m[:-1]
        )  # (T-1, N, 4)
        cur_b = jnp.concatenate([jnp.zeros((1, N, 4)), nb], axis=0)
        cur_m = jnp.concatenate([jnp.zeros((1, N), bool), cur_m[:-1]], axis=0)
        src = np.zeros_like(scores)
        src[h:] = scores[:-h]
        out_boxes.append(np.asarray(cur_b))
        out_scores.append(src * (opts.score_decay**h))
        out_mask.append(np.asarray(cur_m))
        hops.append(np.full((T, N), h, np.int32))

    # backward hops: dets from t land at t-h
    cur_b, cur_m = jnp.asarray(boxes), jnp.asarray(mask)
    for h in range(1, w + 1):
        nb = jax.vmap(lambda f, b, m: _propagate_hop(f, b, m, coord_scale))(
            bwd, cur_b[1:], cur_m[1:]
        )  # (T-1, N, 4) → t
        cur_b = jnp.concatenate([nb, jnp.zeros((1, N, 4))], axis=0)
        cur_m = jnp.concatenate([cur_m[1:], jnp.zeros((1, N), bool)], axis=0)
        src = np.zeros_like(scores)
        src[:-h] = scores[h:]
        out_boxes.append(np.asarray(cur_b))
        out_scores.append(src * (opts.score_decay**h))
        out_mask.append(np.asarray(cur_m))
        hops.append(np.full((T, N), -h, np.int32))

    return (
        np.concatenate(out_boxes, axis=1),
        np.concatenate(out_scores, axis=1),
        np.concatenate(out_mask, axis=1),
        np.concatenate(hops, axis=1),
    )


def mgp(
    vid_proto: dict,
    det_proto: dict,
    opts: MGPOptions = MGPOptions(),
    frames_u8: Optional[np.ndarray] = None,
) -> dict:
    """Full MGP stage: vid_proto + det_proto → det_proto (densified)."""
    metrics = StageMetrics("mgp")
    fids = get_frame_ids(vid_proto)
    if frames_u8 is None:
        loader = FrameLoader(vid_proto, target_hw=opts.image_hw)
        frames_u8 = np.stack([img for _, img, _ in loader.iter_frames()])
        loader.close()
    boxes, scores, mask = det_proto_to_arrays(
        det_proto, fids, opts.max_boxes, opts.num_classes
    )
    b2, s2, m2, _ = propagate_dets(frames_u8, boxes, scores, mask, opts)
    out = arrays_to_det_proto(
        b2, s2, m2, fids, vid_proto["video"], score_thresh=0.0
    )
    if opts.run_nms:
        out = frame_nms(
            vid_proto, out, thresh=opts.nms_thresh, backend="host"
        )
    metrics.set("frames", len(fids))
    metrics.set("dets_in", len(det_proto["detections"]))
    metrics.set("dets_out", len(out["detections"]))
    metrics.finish()
    return out
