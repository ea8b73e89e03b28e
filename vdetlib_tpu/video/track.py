"""Tubelet proposal: greedy anchor selection + batched correlation tracking.

Reference parity: ``vdetlib/vid/track.py::track_from_det`` + ``fcn_tracker``
(SURVEY.md §3.2). The reference looped: pick the highest-scoring uncovered
detection as anchor → run the tracker frame-by-frame forward and backward →
suppress covered detections → repeat.

TPU design:
- Dense tracker features are computed ONCE for all frames (batched conv) and
  shared by every anchor.
- A whole batch of anchors is tracked simultaneously: the per-frame
  sequential dependency (box_t depends on box_{t-1}) is a single
  ``lax.scan`` over the frame axis, ``vmap``-ped over anchors. Both temporal
  directions run as scans (backward = scan over reversed features).
- Anchors start mid-video: the forward scan carries a dead/alive flag that
  flips on at each anchor's frame, so one static-shape program serves any
  anchor frame (no dynamic slicing on T).
- Greedy selection runs on host in ROUNDS: each round picks up to A mutually
  non-overlapping top-score uncovered detections, tracks them in ONE device
  call, then suppresses. This preserves the reference's greedy semantics at
  round granularity while keeping the device busy with batched work.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.loader import FrameLoader
from vdetlib_tpu.geometry.boxes import pairwise_iou
from vdetlib_tpu.nn.tracker_net import (
    TrackerConfig,
    TrackerNet,
    correlate,
    extract_template,
    search_window,
    soft_argmax_2d,
)
from vdetlib_tpu.nn.heads import roi_align
from vdetlib_tpu.protos.accessors import tracks_proto_from_boxes
from vdetlib_tpu.utils.common import iou as np_iou
from vdetlib_tpu.utils.log import StageMetrics


@dataclass(frozen=True)
class TrackOptions:
    max_tracks: int = 32
    anchors_per_round: int = 8
    anchor_thresh: float = 0.3  # min det score to seed a track
    conf_thresh: float = 0.5  # tracker termination confidence
    cover_thresh: float = 0.5  # det covered if IoU with a track box exceeds this
    batch_size: int = 16  # frames per feature-extraction batch
    image_hw: Optional[tuple] = None  # None = native frame size
    # detection snapping: after each NCC update, blend the tracked box toward
    # the best same-frame detection overlapping it (IoU > snap_iou among the
    # anchor-candidate det set). Re-anchors the tracker to detector evidence
    # every frame so correlation drift cannot compound — the headroom probe
    # (RESULTS.md round 4) attributed the pipeline's largest accuracy gap to
    # track identity/drift. 0.0 = off.
    snap_weight: float = 0.0
    snap_iou: float = 0.5
    # advance the NCC scan every s-th frame only, interpolating the skipped
    # frames (track_batch docstring). The scan is launch-overhead-bound
    # (RESULTS.md MFU table: ncc_scan at 2.2% of peak), so steps ∝ 1/s.
    # DEFAULT 2 (round 5): halves scan steps AND tracker-feature compute;
    # measured quality-NEUTRAL on 100 held-out hard-tier videos (0.5658 vs
    # 0.5654, +0.4 on the tuning draw) — same flip precedent as the
    # quarter-res flow preset. Set 1 for frame-exact reference semantics.
    frame_stride: int = 2


def init_tracker(cfg: TrackerConfig = TrackerConfig(), image_hw=(240, 320), seed: int = 0):
    model = TrackerNet(cfg)
    H, W = image_hw
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    return model, params


@functools.partial(jax.jit, static_argnames=("model",))
def tracker_features(model: TrackerNet, params, frames_u8):
    """(B, H, W, 3) uint8 → (B, h, w, C) dense tracker features."""
    x = frames_u8.astype(jnp.float32) / 255.0 - 0.5
    return model.apply(params, x)


def ncc_update(feat_t, box, template, cfg):
    """One NCC tracking update at one frame (shared by batch + streaming).

    Args:
      feat_t: (h, w, C) tracker features of the target frame.
      box: (4,) current box; template: (P, P, C) normalized.
    Returns:
      (new_box_candidate (4,), peak confidence) — no alive logic here.
    """
    Q = cfg.search_pool
    P = cfg.template_pool
    R = Q - P + 1
    S = max(int(cfg.num_scales), 1)
    scale_factors = jnp.asarray(
        [cfg.scale_step ** (s - (S - 1) / 2.0) for s in range(S)], jnp.float32
    )

    def at_scale(s):
        # box resized by s around its center, then the usual NCC search
        cx = 0.5 * (box[0] + box[2])
        cy = 0.5 * (box[1] + box[3])
        w = (box[2] - box[0]) * s
        h = (box[3] - box[1]) * s
        sbox = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        win = search_window(sbox, cfg.search_factor)
        # bf16 pooling: this runs once per anchor per FRAME inside the scan —
        # the MXU-rate matmuls cut the tracker scan's dominant fusion ~3×;
        # NCC peaks are smooth enough that ~3-digit interpolation does not
        # move the argmax (IoU-tolerance tests unchanged).
        sfeat = roi_align(
            feat_t, win[None], stride=cfg.stride, pool=Q,
            compute_dtype=jnp.bfloat16,
        )[0]
        resp = correlate(template, sfeat)  # (R, R)
        py, px, peak = soft_argmax_2d(resp)
        wx = (win[2] - win[0]) / Q
        wy = (win[3] - win[1]) / Q
        dx = (px - (R - 1) / 2.0) * wx
        dy = (py - (R - 1) / 2.0) * wy
        cand = sbox + jnp.stack([dx, dy, dx, dy])
        return peak, cand

    if S == 1:
        return_peak, new_box = at_scale(jnp.float32(1.0))
        return new_box, return_peak
    peaks, cands = jax.vmap(at_scale)(scale_factors)  # (S,), (S, 4)
    # standard scale-change penalty: prefer the current scale unless another
    # is clearly better
    penalty = jnp.where(jnp.abs(scale_factors - 1.0) < 1e-6, 1.0, cfg.scale_penalty)
    best = jnp.argmax(peaks * penalty)
    peak = peaks[best]
    raw = cands[best]
    # damp the scale change: blend the winning box's size with the carried
    # size (position from the winner)
    d = cfg.scale_damping
    rcx = 0.5 * (raw[0] + raw[2])
    rcy = 0.5 * (raw[1] + raw[3])
    rw = (raw[2] - raw[0]) * d + (box[2] - box[0]) * (1 - d)
    rh = (raw[3] - raw[1]) * d + (box[3] - box[1]) * (1 - d)
    new_box = jnp.stack([rcx - rw / 2, rcy - rh / 2, rcx + rw / 2, rcy + rh / 2])
    return new_box, peak


def snap_to_dets(box, det_boxes, det_scores, det_valid, snap_iou, snap_weight):
    """Blend a tracked box toward the best same-frame detection (one lane).

    Selection: among valid dets with IoU(box, det) > snap_iou, the one with
    the highest score; score ties break by higher IoU, and any residual tie
    lexicographically over the box coordinates (x1, y1, x2, y2 in turn), so
    the target is always a REAL detection, never a coordinate-wise hybrid of
    tied dets (ADVICE r4). Every reduction is a masked max, so the result is
    PERMUTATION-INVARIANT in the det slot axis — the staged and fused engines
    pack the same det set in different slot orders and must snap identically
    (the parity contract of tests/test_fused_parity.py).

    Args:
      box: (4,) tracked box; det_boxes: (N, 4); det_scores/det_valid: (N,).
    Returns:
      (snapped (4,), any_candidate (bool)).
    """
    iou = pairwise_iou(box[None], det_boxes)[0]  # (N,)
    cand = det_valid & (iou > snap_iou)
    neg = jnp.float32(-jnp.inf)
    s = jnp.where(cand, det_scores, neg)
    s_max = jnp.max(s)
    any_c = s_max > neg
    c2 = cand & (det_scores == s_max)
    i_max = jnp.max(jnp.where(c2, iou, neg))
    c3 = c2 & (iou == i_max)
    # residual tie-break: successive coordinate maxima narrow c3 to dets that
    # agree on EVERY coordinate, so the final masked max IS one of them
    for d in range(4):
        d_max = jnp.max(jnp.where(c3, det_boxes[:, d], neg))
        c3 = c3 & (det_boxes[:, d] == d_max)
    target = jnp.max(jnp.where(c3[:, None], det_boxes, neg), axis=0)  # (4,)
    snapped = jnp.where(
        any_c, (1.0 - snap_weight) * box + snap_weight * target, box
    )
    return snapped, any_c


def _track_one_direction(feats, anchor_t, anchor_box, template, cfg, conf_thresh, reverse,
                         snap=None, snap_iou=0.5, snap_weight=0.5):
    """Scan over the full frame axis for one anchor, one direction.

    Args:
      feats: (T, h, w, C) tracker features.
      anchor_t: scalar int frame index of the anchor.
      anchor_box: (4,) pixel box at the anchor frame.
      template: (P, P, C) normalized template features.
    Returns:
      boxes (T, 4), conf (T,), alive (T,) — entries before/at the anchor (in
      scan direction) are dead.
    """
    T = feats.shape[0]
    ts = jnp.arange(T)
    if reverse:
        feats = feats[::-1]
        ts = ts[::-1]
    if snap is not None:
        snap_b, snap_s, snap_v = snap
        if reverse:
            snap_b, snap_s, snap_v = snap_b[::-1], snap_s[::-1], snap_v[::-1]
    else:
        # zero-det placeholder keeps ONE scan structure (valid all-False)
        snap_b = jnp.zeros((T, 1, 4), jnp.float32)
        snap_s = jnp.zeros((T, 1), jnp.float32)
        snap_v = jnp.zeros((T, 1), bool)

    adapt = cfg.template_eta > 0.0  # static (cfg reaches here via closures)

    def step(carry, inp):
        feat_t, t, db, dsc, dv = inp
        if adapt:
            box, alive, tpl = carry
        else:
            box, alive = carry
            tpl = template
        started = t == anchor_t
        box = jnp.where(started, anchor_box, box)
        alive = jnp.logical_or(alive, started)
        if adapt:
            tpl = jnp.where(started, template, tpl)
        new_box, peak = ncc_update(feat_t, box, tpl, cfg)
        track_now = alive & (t != anchor_t)
        ok = peak > conf_thresh
        new_alive = jnp.where(track_now, alive & ok, alive)
        new_box = jnp.where(track_now & ok, new_box, box)
        if snap is not None:
            snapped, _ = snap_to_dets(new_box, db, dsc, dv, snap_iou, snap_weight)
            new_box = jnp.where(track_now & ok, snapped, new_box)
        conf_out = jnp.where(started, 1.0, peak)
        emit_alive = jnp.where(started, True, new_alive)
        if adapt:
            # same EMA rule as track_batch's folded scan (kept in lockstep —
            # the folded-vs-two-scan parity test covers both modes)
            fresh = extract_template(feat_t, new_box, cfg)
            eta = jnp.float32(cfg.template_eta)
            blend = (1.0 - eta) * tpl + eta * fresh
            blend = blend / jnp.sqrt(jnp.sum(blend * blend) + 1e-6)
            upd = track_now & ok & (peak > cfg.template_update_conf)
            tpl = jnp.where(upd, blend, tpl)
            return (new_box, new_alive, tpl), (new_box, conf_out, emit_alive)
        return (new_box, new_alive), (new_box, conf_out, emit_alive)

    init = (jnp.zeros(4, jnp.float32), jnp.asarray(False))
    if adapt:
        init = init + (template,)
    _, (boxes, conf, alive) = jax.lax.scan(
        step, init, (feats, ts, snap_b, snap_s, snap_v)
    )
    if reverse:
        boxes, conf, alive = boxes[::-1], conf[::-1], alive[::-1]
    return boxes, conf, alive


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "cfg", "conf_thresh", "unroll", "frame_stride",
        "feats_strided", "full_t",
    ),
)
def track_batch(
    model: TrackerNet,
    cfg: TrackerConfig,
    feats,
    anchor_ts,
    anchor_boxes,
    conf_thresh: float,
    unroll: int = 1,
    snap=None,  # optional (det_boxes (T,N,4), det_scores (T,N), valid (T,N))
    snap_iou=0.5,
    snap_weight=0.5,
    frame_stride: int = 1,
    feats_strided: bool = False,
    full_t: int | None = None,
    valid_t=None,  # dynamic count of REAL frames when T is bucket-padded
):
    """Track A anchors forward+backward over (T, h, w, C) features.

    Both temporal directions are FOLDED into one ``lax.scan`` of T steps:
    step i advances the forward lanes at frame i and the backward lanes at
    frame T-1-i (2A lanes of batched NCC work per step). Versus two
    sequential T-step scans this halves the scan's sequential depth — the
    tracker is step-overhead-bound, not FLOP-bound. Per-lane math is
    identical to the two-scan form up to compile-time reassociation of the
    bf16 pooling (parity-tested: same alive decisions, <0.05px box drift).

    ``frame_stride`` > 1 (VERDICT r4 item 6): the scan advances on every
    s-th frame only (the scan is launch-overhead-bound, so steps ∝ 1/s);
    skipped frames get linearly interpolated boxes/conf between their
    sampled neighbors (alive iff both neighbors are). Anchors snap to the
    nearest sampled frame for the scan; the anchor's ORIGINAL frame is
    re-asserted (anchor box, conf 1.0) in the upsampled output, matching
    the stride-1 contract. stride=1 is byte-identical to the legacy path.

    Returns boxes (A, T, 4), conf (A, T), alive (A, T); the anchor frame is
    alive with conf 1.0; dead frames carry the last live box (masked out).

    ``feats_strided=True`` (stride-mode callers that want to skip computing
    features for frames the scan never reads — pipeline/fused.py): ``feats``
    already holds only every s-th frame's features (ceil(full_t/s) rows) and
    ``full_t`` gives the original frame count. Output shapes/values are
    IDENTICAL to passing full-T features — the stride path only ever reads
    ``feats[::s]``. ``anchor_ts`` / ``snap`` stay in FULL-frame indexing.

    ``valid_t`` (stride mode with bucket-padded T — pipeline/fused.py): the
    dynamic count of REAL frames. Without it, anchor snapping can round UP
    past the last real frame onto a PAD sample, and interpolation near the
    real end reads the scan's pad-frame outputs — both diverge from an
    unpadded run of the same video (the staged engine). With it, the snap
    and the interpolation neighbor clamp to the last real sampled frame,
    making padded and unpadded runs identical on real frames.
    """
    if frame_stride > 1:
        s = int(frame_stride)
        if feats_strided:
            if full_t is None:
                raise ValueError("feats_strided=True requires full_t")
            T = int(full_t)
            feats_s = feats
            if feats_s.shape[0] != -(-T // s):  # ceil
                raise ValueError(
                    f"pre-strided feats have {feats_s.shape[0]} rows, "
                    f"expected ceil({T}/{s})"
                )
        else:
            T = feats.shape[0]
            feats_s = feats[::s]
        Ts = feats_s.shape[0]
        # last sampled index that falls on a REAL frame (Ts-1 if unpadded)
        if valid_t is None:
            last_sample = Ts - 1
        else:
            last_sample = jnp.maximum((valid_t - 1) // s, 0)
        anchor_ts_s = jnp.clip((anchor_ts + s // 2) // s, 0, last_sample)
        snap_s = None
        if snap is not None:
            snap_s = tuple(a[::s] for a in snap)
        boxes_s, conf_s, alive_s = track_batch(
            model, cfg, feats_s, anchor_ts_s, anchor_boxes, conf_thresh,
            unroll=unroll, snap=snap_s, snap_iou=snap_iou,
            snap_weight=snap_weight, frame_stride=1,
        )
        t_full = jnp.arange(T)
        i0 = t_full // s
        i1 = jnp.minimum(i0 + 1, last_sample)
        f = ((t_full - i0 * s).astype(jnp.float32) / s)[None, :, None]
        b0, b1 = boxes_s[:, i0], boxes_s[:, i1]
        boxes = (1.0 - f) * b0 + f * b1
        exact = (t_full % s == 0)[None, :]
        a0, a1 = alive_s[:, i0], alive_s[:, i1]
        alive = jnp.where(exact, a0, a0 & a1)
        boxes = jnp.where(exact[..., None], b0, boxes)
        c0, c1 = conf_s[:, i0], conf_s[:, i1]
        conf = jnp.where(exact, c0, (1.0 - f[..., 0]) * c0 + f[..., 0] * c1)
        # re-assert the anchor at its ORIGINAL frame
        A = anchor_ts.shape[0]
        lane = jnp.arange(A)
        boxes = boxes.at[lane, anchor_ts].set(anchor_boxes)
        conf = conf.at[lane, anchor_ts].set(1.0)
        alive = alive.at[lane, anchor_ts].set(True)
        return boxes, conf, alive

    if feats_strided:
        raise ValueError("feats_strided requires frame_stride > 1")
    T = feats.shape[0]
    templates = jax.vmap(
        lambda at, ab: extract_template(feats[at], ab, cfg)
    )(anchor_ts, anchor_boxes)  # (A, P, P, C)

    import os

    if (
        cfg.num_scales <= 1
        and snap is None  # the parked Pallas kernel has no snapping path
        and jax.default_backend() == "tpu"
        and os.environ.get("VDETLIB_TPU_TRACK_PALLAS") == "1"
    ):
        # EXPERIMENTAL, off by default: the Pallas whole-scan kernel
        # (kernels/track_pallas.py) is hardware-correct but measured 1.8×
        # SLOWER than this XLA scan (35.5 vs 19.8 ms at T=256/A=8) — Mosaic
        # forces the ROI-align w-contraction onto VPU loops whose in-kernel
        # iteration overhead exceeds the scan's per-step launch cost it was
        # built to remove (RESULTS.md round 2). Kept for future tuning.
        from vdetlib_tpu.kernels.track_pallas import track_scan_pallas

        fb, fc, fa, bb, bc, ba = track_scan_pallas(
            feats, anchor_ts, anchor_boxes, templates,
            Q=cfg.search_pool, P=cfg.template_pool,
            factor=cfg.search_factor, stride=cfg.stride,
            conf_thresh=conf_thresh,
        )
        fb, fc, fa, bb, bc, ba = (
            jnp.moveaxis(v, 0, 1) for v in (fb, fc, fa, bb, bc, ba)
        )
        use_f = jnp.arange(T)[None, :] >= anchor_ts[:, None]  # (A, T)
        boxes = jnp.where(use_f[..., None], fb, bb)
        conf = jnp.where(use_f, fc, bc)
        alive = jnp.where(use_f, fa, ba)
        return boxes, conf, alive

    adapt = cfg.template_eta > 0.0  # static (cfg is a static argname)

    def step(carry, inp):
        if adapt:
            fbox, falive, bbox, balive, tpl2 = carry
        else:
            fbox, falive, bbox, balive = carry
        feat_f, t = inp
        tb = T - 1 - t
        feat_b = jax.lax.dynamic_index_in_dim(feats, tb, 0, keepdims=False)
        if snap is not None:
            snap_b, snap_s, snap_v = snap
            det2 = tuple(
                jnp.stack([
                    jax.lax.dynamic_index_in_dim(a, t, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(a, tb, 0, keepdims=False),
                ])
                for a in (snap_b, snap_s, snap_v)
            )  # each (2, N, ...)

        # Both directions' lane state stacked to (2, A, ...): every NCC op
        # (pooling matmuls, correlation convs) runs ONCE with a 2A batch —
        # the TPU core executes fusions sequentially, so two separate A-lane
        # calls would serialize and forfeit the fold's win.
        ts2 = jnp.stack([t, tb])  # (2,)
        started = ts2[:, None] == anchor_ts[None, :]  # (2, A)
        box = jnp.where(
            started[..., None], anchor_boxes[None], jnp.stack([fbox, bbox])
        )
        alive2 = jnp.stack([falive, balive]) | started
        if adapt:
            # a lane that (re)starts this step tracks from its ANCHOR
            # template, exactly like the frozen path
            tpl2 = jnp.where(
                started[..., None, None, None], templates[None], tpl2
            )
            new_box, peak = jax.vmap(
                lambda ft, bxs, tps: jax.vmap(
                    lambda b, tp: ncc_update(ft, b, tp, cfg)
                )(bxs, tps)
            )(jnp.stack([feat_f, feat_b]), box, tpl2)
        else:
            # frozen templates reach ncc_update as a CLOSURE CONSTANT, not a
            # mapped operand: threading the (2, A, P, P, C) stack through the
            # scan body (the r5 EMA refactor briefly did) defeats XLA's
            # loop-invariant hoisting and re-lays the stack out EVERY step —
            # measured 20.9 -> 49.3 ms for the A=8 round (scripts/
            # ab_track_versions.py, the r3/r4/HEAD interleaved A/B).
            new_box, peak = jax.vmap(
                lambda ft, bxs: jax.vmap(
                    lambda b, tp: ncc_update(ft, b, tp, cfg)
                )(bxs, templates)
            )(jnp.stack([feat_f, feat_b]), box)
        track_now = alive2 & (ts2[:, None] != anchor_ts[None, :])
        ok = peak > conf_thresh
        new_alive = jnp.where(track_now, alive2 & ok, alive2)
        new_box = jnp.where((track_now & ok)[..., None], new_box, box)
        if snap is not None:
            db, dsc, dv = det2
            snapped, _ = jax.vmap(  # over the 2 directions
                lambda bxs, b_, s_, v_: jax.vmap(  # over the A lanes
                    lambda bx: snap_to_dets(bx, b_, s_, v_, snap_iou, snap_weight)
                )(bxs)
            )(new_box, db, dsc, dv)
            new_box = jnp.where(
                (track_now & ok)[..., None], snapped, new_box
            )
        conf_out = jnp.where(started, 1.0, peak)
        emit_alive = jnp.where(started, True, new_alive)
        if adapt:
            # EMA toward the features at the new box, gated on confidence
            # (peak > template_update_conf) so the template cannot walk onto
            # an occluder during a low-confidence stretch; renormalized so
            # the NCC response stays a cosine similarity
            fresh = jax.vmap(
                lambda ft, bxs: jax.vmap(
                    lambda b: extract_template(ft, b, cfg)
                )(bxs)
            )(jnp.stack([feat_f, feat_b]), new_box)  # (2, A, P, P, C)
            eta = jnp.float32(cfg.template_eta)
            blend = (1.0 - eta) * tpl2 + eta * fresh
            norm = jnp.sqrt(
                jnp.sum(blend * blend, axis=(-3, -2, -1), keepdims=True)
                + 1e-6
            )
            blend = blend / norm
            upd = track_now & ok & (peak > cfg.template_update_conf)
            tpl2 = jnp.where(upd[..., None, None, None], blend, tpl2)
            carry_out = (
                new_box[0], new_alive[0], new_box[1], new_alive[1], tpl2,
            )
        else:
            carry_out = (new_box[0], new_alive[0], new_box[1], new_alive[1])
        return (
            carry_out,
            (
                new_box[0], conf_out[0], emit_alive[0],
                new_box[1], conf_out[1], emit_alive[1],
            ),
        )

    A = anchor_ts.shape[0]
    init = (
        jnp.zeros((A, 4), jnp.float32), jnp.zeros((A,), bool),
        jnp.zeros((A, 4), jnp.float32), jnp.zeros((A,), bool),
    )
    if adapt:
        init = init + (jnp.stack([templates, templates]),)
    _, (fb, fc, fa, bb, bc, ba) = jax.lax.scan(
        step, init, (feats, jnp.arange(T)), unroll=unroll
    )
    # scan axis: fwd outputs are at frame t=i; bwd outputs at frame T-1-i.
    fb, fc, fa = (jnp.moveaxis(v, 0, 1) for v in (fb, fc, fa))
    bb, bc, ba = (jnp.moveaxis(jnp.flip(v, 0), 0, 1) for v in (bb, bc, ba))
    use_f = jnp.arange(T)[None, :] >= anchor_ts[:, None]  # (A, T)
    boxes = jnp.where(use_f[..., None], fb, bb)
    conf = jnp.where(use_f, fc, bc)
    alive = jnp.where(use_f, fa, ba)
    return boxes, conf, alive


def _candidate_dets(det_proto, frame_index, min_score):
    """Flatten det_proto → (frames_idx[N], boxes[N,4], scores[N]) numpy."""
    fr, bx, sc = [], [], []
    for d in det_proto["detections"]:
        t = frame_index.get(int(d["frame"]))
        if t is None:
            continue
        best = max((float(s["score"]) for s in d["scores"]), default=0.0)
        if best < min_score:
            continue
        fr.append(t)
        bx.append(d["bbox"])
        sc.append(best)
    if not fr:
        return np.zeros(0, int), np.zeros((0, 4), np.float32), np.zeros(0, np.float32)
    return np.asarray(fr), np.asarray(bx, np.float32), np.asarray(sc, np.float32)


def track_from_det(
    model,
    params,
    vid_proto: dict,
    det_proto: dict,
    cfg: TrackerConfig = TrackerConfig(),
    opts: TrackOptions = TrackOptions(),
    frames_u8: Optional[np.ndarray] = None,
) -> dict:
    """Full tubelet-proposal stage: vid_proto + det_proto → track_proto."""
    metrics = StageMetrics("track")
    frame_ids = [f["frame"] for f in vid_proto["frames"]]
    frame_index = {f: i for i, f in enumerate(frame_ids)}
    T = len(frame_ids)

    # --- frame features (device, batched once) ---
    if frames_u8 is None:
        loader = FrameLoader(vid_proto, target_hw=opts.image_hw)
        frames_u8 = np.stack([img for _, img, _ in loader.iter_frames()])
        loader.close()
    # at frame_stride > 1 the scan only reads every stride-th frame's
    # features — compute those ONLY (halves the feature block at stride 2;
    # outputs identical, track_batch's feats_strided contract)
    stride = int(opts.frame_stride)
    feat_src = frames_u8[::stride] if stride > 1 else frames_u8
    Tf = len(feat_src)
    feats_list = []
    B = opts.batch_size
    for s in range(0, Tf, B):
        chunk = jnp.asarray(feat_src[s : s + B])
        pad = B - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, axis=0)])
        f = tracker_features(model, params, chunk)
        # stay ON DEVICE: a host round-trip of the feature tensor costs ~1s
        # per chunk over this terminal's ~30MB/s transfer path
        feats_list.append(f[: B - pad if pad else B])
    feats = jnp.concatenate(feats_list, axis=0)

    # --- greedy anchor rounds (host) ---
    cand_t, cand_boxes, cand_scores = _candidate_dets(
        det_proto, frame_index, opts.anchor_thresh
    )
    snap = None
    if opts.snap_weight > 0.0 and len(cand_t):
        # per-frame padded arrays of the anchor-candidate det set (the same
        # set the fused engine snaps to: post-MGP dets with best score >=
        # anchor_thresh). Padded to an 8-bucket to bound recompiles.
        counts = np.bincount(cand_t, minlength=T)
        npad = max(8, int(-(-counts.max() // 8) * 8))
        sb = np.zeros((T, npad, 4), np.float32)
        ss = np.zeros((T, npad), np.float32)
        sv = np.zeros((T, npad), bool)
        fill = np.zeros(T, np.int32)
        for i in range(len(cand_t)):
            t, j = int(cand_t[i]), int(fill[cand_t[i]])
            sb[t, j] = cand_boxes[i]
            ss[t, j] = cand_scores[i]
            sv[t, j] = True
            fill[t] += 1
        snap = (jnp.asarray(sb), jnp.asarray(ss), jnp.asarray(sv))
    covered = np.zeros(len(cand_t), dtype=bool)
    all_boxes, all_conf, all_alive, all_anchor = [], [], [], []
    while len(all_boxes) < opts.max_tracks and not covered.all():
        # pick up to A mutually non-overlapping top candidates
        order = np.argsort(-cand_scores, kind="stable")
        picked = []
        for i in order:
            if covered[i]:
                continue
            clash = False
            for j in picked:
                if cand_t[j] == cand_t[i] and np_iou(
                    cand_boxes[i : i + 1], cand_boxes[j : j + 1]
                )[0, 0] > opts.cover_thresh:
                    clash = True
                    break
            if not clash:
                picked.append(int(i))
            if len(picked) == min(
                opts.anchors_per_round, opts.max_tracks - len(all_boxes)
            ):
                break
        if not picked:
            break
        A = opts.anchors_per_round
        sel = (picked + [picked[-1]] * A)[:A]  # pad to static A
        boxes, conf, alive = track_batch(
            model,
            cfg,
            feats,
            jnp.asarray(np.asarray(cand_t)[sel]),
            jnp.asarray(cand_boxes[sel]),
            opts.conf_thresh,
            snap=snap,
            snap_iou=opts.snap_iou,
            snap_weight=opts.snap_weight,
            frame_stride=opts.frame_stride,
            feats_strided=stride > 1,
            full_t=T if stride > 1 else None,
        )
        boxes, conf, alive = np.asarray(boxes), np.asarray(conf), np.asarray(alive)
        for k, i in enumerate(picked):
            all_boxes.append(boxes[k])
            all_conf.append(conf[k])
            all_alive.append(alive[k])
            all_anchor.append(int(frame_ids[cand_t[i]]))
            covered[i] = True
            # suppress candidates covered by this track
            for t in range(T):
                if not alive[k, t]:
                    continue
                same_t = cand_t == t
                if not same_t.any():
                    continue
                m = np_iou(boxes[k, t : t + 1], cand_boxes[same_t])[0]
                idx = np.nonzero(same_t)[0][m > opts.cover_thresh]
                covered[idx] = True

    per_track = []
    for boxes, conf, alive in zip(all_boxes, all_conf, all_alive):
        per_track.append(
            [
                (frame_ids[t], boxes[t], float(conf[t]))
                for t in range(T)
                if alive[t]
            ]
        )
    proto = tracks_proto_from_boxes(
        per_track, vid_proto["video"], method="correlation_tracker", anchors=all_anchor
    )
    metrics.set("frames", T)
    metrics.set("tracks", len(proto["tracks"]))
    metrics.finish()
    return proto
