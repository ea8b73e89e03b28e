"""Streaming (online, chunked) video processing for arbitrarily long videos.

SURVEY.md §5.7: the frame axis is the sequence axis; long videos are
processed in fixed-size chunks with carried state across boundaries —
scan-over-chunks, the CNN-era analog of blockwise sequence processing.

Per chunk (one device dispatch each for detect/flow/track):
- detection + per-frame per-class NMS (stateless);
- MOTION-GUIDED PROPAGATION with a one-frame halo: flow is computed over
  [prev chunk's last frame] + chunk (the only cross-chunk coupling MGP
  needs — SURVEY.md §5.7 "halo exchange of 1 boundary frame"); detections
  propagate t→t+1 (including across the boundary, via carried last-frame
  detections) and t→t-1 within the chunk, then per-frame per-class NMS
  dedups the union. Causal deviation from the batch stage: the backward hop
  from the NEXT chunk's first frame into this chunk's last frame is dropped
  (the future is unknown at emission time).
- ONLINE tracking with carried state: active track slots carry
  (box, alive, template) across chunk boundaries; a chunk-level
  ``lax.scan`` advances all slots; new tracks are seeded from the chunk's
  top uncovered detections (host-side greedy, as in track_from_det).
- BACKWARD RE-TRACKING of fresh seeds over a sliding window: tracker
  features of the previous chunk are retained, and each new seed is tracked
  backward from its anchor across [prev chunk + current chunk] in one
  batched scan — the streaming analog of the batch tracker's fwd+bwd
  anchors (SURVEY.md §3.2), with window-bounded latency. Earlier segment
  entries attach to the track retroactively (track protos finalize at end
  of stream; per-frame detection arrays still emit at chunk latency).

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

from vdetlib_tpu.geometry.boxes import shift_boxes
from vdetlib_tpu.kernels.flow import (
    flow_coord_scale,
    flow_video,
    mean_flow_in_boxes,
)
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.nn.tracker_net import extract_template
from vdetlib_tpu.utils.common import iou as np_iou
from vdetlib_tpu.utils.log import StageMetrics, get_logger
from vdetlib_tpu.video.detect import _detect_step
from vdetlib_tpu.video.track import _track_one_direction, ncc_update, tracker_features

log = get_logger("stream")


@dataclass(frozen=True)
class StreamOptions:
    # "fused": the whole per-chunk flow (detect → NMS → MGP → NMS → features
    # → slot advance → greedy seeding → backward re-tracking) compiles into
    # ONE jitted program with device-resident carried state and a single
    # packed host fetch — one dispatch per chunk instead of ~7 + one per
    # seed + per-array transfers. Exact output parity with "host"
    # (tests/test_stream.py::test_fused_engine_matches_host); built because
    # the measured host-loop latency was dispatch-floor-bound (RESULTS.md
    # "Streaming latency on chip": ~35 ms/frame at every chunk size).
    engine: str = "fused"  # "fused" | "host"
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
    # motion-guided propagation (t±1, one-frame halo across chunks)
    mgp: bool = True
    mgp_decay: float = 0.9
    flow_preset: str = "fastest"
    # backward re-tracking of fresh seeds over [prev chunk + current chunk]
    backtrack: bool = True
    # advance the online NCC scan every s-th frame only, interpolating the
    # skipped frames — the streaming analog of TrackOptions.frame_stride
    # (video/track.py; measured held-out-neutral at 2 on the batch path
    # while halving the tracker scan AND feature compute). The chunk's last
    # frame straddles the boundary: its true interpolation needs the next
    # chunk's first sample, so it is emitted one chunk late as a boundary
    # fill (streams already emit at chunk latency; the final frame of the
    # stream holds the last sample, the batch end rule). Detection/MGP
    # arrays are unaffected — only track segments and seeding coverage see
    # the stride. Supported values: 1 (frame-exact) and 2.
    track_stride: int = 1


def _extract_templates_core(feats, seed_ti, seed_boxes, cfg):
    """Gather seed frames + batched template extraction (A lanes).

    ONE definition used by both engines: inlined (barriered) in the fused
    program and jitted standalone for the host loop — the two compile
    bit-identically, whereas eager per-seed extraction rounds differently
    at the last ulp, which the chaotic NCC rollout amplifies to pixels
    (scripts/debug_fused_drift2.py attribution).
    """
    sel = feats[seed_ti]
    return jax.vmap(lambda f, b: extract_template(f, b, cfg))(sel, seed_boxes)


_extract_templates_batch = jax.jit(
    _extract_templates_core, static_argnames=("cfg",)
)


@functools.partial(jax.jit, static_argnames=("cfg", "conf_thresh"))
def track_chunk(cfg, feats, templates, boxes0, alive0, conf_thresh: float):
    """Advance all track slots over one chunk of features.

    Args:
      feats: (Tc, h, w, C); templates: (A, P, P, C); boxes0: (A, 4);
      alive0: (A,) bool — state carried from the previous chunk.
    Returns:
      boxes (A, Tc, 4), conf (A, Tc), alive (A, Tc), plus the final
      (boxes_end, alive_end, templates_end) carry. templates_end equals
      the input templates unless cfg.template_eta > 0 (the EMA template
      adaptation of video/track.py — same rule, so stream and batch
      trackers stay in lockstep; both stream engines share THIS function,
      which is what keeps their parity).
    """
    adapt = cfg.template_eta > 0.0  # static (cfg is a static argname)

    def one_slot(template, box0, a0):
        def step(carry, feat_t):
            if adapt:
                box, alive, tpl = carry
            else:
                box, alive = carry
                tpl = template
            new_box, peak = ncc_update(feat_t, box, tpl, cfg)
            ok = peak > conf_thresh
            new_alive = alive & ok
            new_box = jnp.where(new_alive, new_box, box)
            if adapt:
                fresh = extract_template(feat_t, new_box, cfg)
                eta = jnp.float32(cfg.template_eta)
                blend = (1.0 - eta) * tpl + eta * fresh
                blend = blend / jnp.sqrt(jnp.sum(blend * blend) + 1e-6)
                upd = new_alive & (peak > cfg.template_update_conf)
                tpl = jnp.where(upd, blend, tpl)
                return (new_box, new_alive, tpl), (new_box, peak, new_alive)
            return (new_box, new_alive), (new_box, peak, new_alive)

        init = (box0, a0, template) if adapt else (box0, a0)
        carry_end, (boxes, conf, alive) = jax.lax.scan(step, init, feats)
        tpl_end = carry_end[2] if adapt else template
        return boxes, conf, alive, carry_end[0], carry_end[1], tpl_end

    return jax.vmap(one_slot)(templates, boxes0, alive0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "conf_thresh", "stride", "chunk_len")
)
def track_chunk_strided(
    cfg, feats_s, templates, boxes0, alive0,
    bnd_box, bnd_conf, bnd_alive, conf_thresh: float,
    stride: int, chunk_len: int,
):
    """Strided slot advance + in-program upsampling + boundary fill.

    The streaming analog of ``track_batch(frame_stride=s)`` (video/track.py):
    the scan advances once per SAMPLE (every s-th chunk frame), skipped
    interior frames get linear interpolation of their sampled neighbors
    (alive iff both are), and the chunk's trailing skipped frame holds the
    last sample — its true interpolation needs the NEXT chunk's first
    sample, which this function emits as the BOUNDARY FILL for the previous
    chunk when that next chunk runs. Upsampling happens IN-PROGRAM so both
    stream engines read bit-identical per-frame boxes (the host engine jits
    this standalone, the fused program inlines it behind an
    optimization_barrier — the same sharing that keeps engine parity for
    track_chunk / backtrack_seeds / _extract_templates_core).

    Args:
      feats_s: (Ts, h, w, C) features of every stride-th chunk frame
        (Ts = chunk_len // stride).
      bnd_box/bnd_conf/bnd_alive: previous chunk's scan-END snapshot
        (pre-seeding) — the left neighbor of the boundary frame.
    Returns:
      (boxes (A, chunk_len, 4), conf (A, chunk_len), alive (A, chunk_len),
       box_end (A, 4), conf_end (A,), alive_end (A,), templates_end,
       bfill_box (A, 4), bfill_conf (A,), bfill_alive (A,)) — bfill_* is the
      interpolated entry for the PREVIOUS chunk's last frame.
    """
    if stride != 2:
        raise ValueError("streaming track_stride supports 1 and 2 only")
    if chunk_len % stride:
        raise ValueError("chunk must be a multiple of track_stride")
    s = stride
    boxes_s, conf_s, alive_s, box_end, alive_end, tpl_end = track_chunk(
        cfg, feats_s, templates, boxes0, alive0, conf_thresh
    )
    Ts = feats_s.shape[0]
    t_full = jnp.arange(chunk_len)
    i0 = t_full // s
    i1 = jnp.minimum(i0 + 1, Ts - 1)
    f = ((t_full - i0 * s).astype(jnp.float32) / s)[None, :, None]
    b0, b1 = boxes_s[:, i0], boxes_s[:, i1]
    exact = (t_full % s == 0)[None, :]
    boxes = jnp.where(exact[..., None], b0, (1.0 - f) * b0 + f * b1)
    a0, a1 = alive_s[:, i0], alive_s[:, i1]
    alive = jnp.where(exact, a0, a0 & a1)
    c0, c1 = conf_s[:, i0], conf_s[:, i1]
    conf = jnp.where(exact, c0, (1.0 - f[..., 0]) * c0 + f[..., 0] * c1)
    conf_end = conf_s[:, -1]
    fb = jnp.float32(1.0 / s)
    bfill_box = (1.0 - fb) * bnd_box + fb * boxes_s[:, 0]
    bfill_conf = (1.0 - fb) * bnd_conf + fb * conf_s[:, 0]
    bfill_alive = bnd_alive & alive_s[:, 0]
    return (
        boxes, conf, alive, box_end, conf_end, alive_end, tpl_end,
        bfill_box, bfill_conf, bfill_alive,
    )


def _snap_sample(ti, tc_valid, stride: int):
    """Seed frame → nearest sampled index, clamped to the last REAL sample.

    Same rounding as track_batch's anchor snap ((ti + s//2) // s); the clamp
    keeps a rounded-up seed on a real frame when the chunk is padded. Works
    on python ints (host engine) and jnp int32 (fused program) identically.
    """
    s = stride
    last = (tc_valid - 1) // s
    if isinstance(ti, (int, np.integer)):
        return int(min((ti + s // 2) // s, max(last, 0)))
    return jnp.minimum((ti + s // 2) // s, jnp.maximum(last, 0))


def _backtrack_entries_strided(
    bb_row, ba_row, t_global: int, chunk: int, stride: int,
    seed_ti: int, seed_box,
):
    """Upsample one backtracked lane from sample space to frame entries.

    Window sample j covers global frame (t_global - chunk) + stride*j. The
    anchor sample is patched alive with the SEED BOX so interpolation can
    bridge the gap up to the seed (the batch tracker's anchors are alive at
    their anchor sample); emitted frames are strictly BEFORE the seed frame
    (the seed entry itself is recorded by the caller). Pure numpy and shared
    by both engines, so their segments match bit-for-bit.
    """
    s = stride
    Ts = chunk // s
    anchor_j = Ts + _snap_sample(seed_ti, chunk, s)
    base = t_global - chunk
    bb = np.asarray(bb_row, np.float32)
    ba = np.asarray(ba_row, bool)
    bx = bb.copy()
    ba_p = ba.copy()
    if anchor_j < 2 * Ts:
        bx[anchor_j] = np.asarray(seed_box, np.float32)
        ba_p[anchor_j] = True
    seed_abs = t_global + seed_ti
    entries = []
    for j in range(2 * Ts):
        g = base + s * j
        if ba[j] and 0 <= g < seed_abs:
            entries.append((g, bb[j].copy(), 0.0))
        if j + 1 < 2 * Ts and ba[j] and ba_p[j + 1]:
            for r in range(1, s):
                g2 = g + r
                if 0 <= g2 < seed_abs:
                    fr = np.float32(r / s)
                    box = ((1.0 - fr) * bx[j] + fr * bx[j + 1]).astype(
                        np.float32
                    )
                    entries.append((g2, box, 0.0))
    return entries


@functools.partial(jax.jit, static_argnames=("cfg", "conf_thresh"))
def backtrack_seeds(
    cfg, feats_window, anchor_ts, anchor_boxes, templates, seeded,
    conf_thresh: float,
):
    """Track fresh seeds BACKWARD over the retained feature window.

    Args:
      feats_window: (Tw, h, w, C) — prev chunk + current chunk features.
      anchor_ts: (A,) window-local anchor positions; anchor_boxes: (A, 4);
      templates: (A, P, P, C); seeded: (A,) bool — lanes seeded this chunk.
    Returns:
      boxes (A, Tw, 4), alive (A, Tw) — alive only BEFORE each lane's anchor
      (the anchor entry itself is recorded by the caller), False everywhere
      for unseeded lanes.
    """

    def one(anchor_t, anchor_box, template, on):
        boxes, conf, alive = _track_one_direction(
            feats_window, anchor_t, anchor_box, template, cfg, conf_thresh,
            reverse=True,
        )
        t_idx = jnp.arange(feats_window.shape[0])
        alive = alive & (t_idx < anchor_t) & on
        return boxes, alive

    return jax.vmap(one)(anchor_ts, anchor_boxes, templates, seeded)


@functools.partial(jax.jit, static_argnames=("preset",))
def _mgp_chunk(
    frames_ext,  # (Tc+1, H, W, 3): [prev last frame] + chunk
    rois,  # (Tc, R, 4) this chunk's proposal boxes
    cls_scores,  # (Tc, C-1, R) this chunk's per-class det scores
    keep,  # (Tc, C-1, R) NMS survivors (the propagated set)
    prev_rois,  # (R, 4) previous chunk's last-frame boxes
    prev_scores,  # (C-1, R) previous chunk's last-frame scores
    prev_keep,  # (C-1, R)
    decay,
    preset: str = "fast",
):
    """One chunk of motion-guided propagation (t±1, one-frame fwd halo).

    Returns merged (boxes (Tc, 3R, 4), scores (Tc, C-1, 3R),
    valid (Tc, C-1, 3R)) in slot blocks [native, fwd, bwd] — the same block
    convention as the batch stage (video/mgp.py::propagate_dets, w=1).
    """
    Tc, R = rois.shape[:2]
    coord_scale = flow_coord_scale(preset)
    flow_kw = dict(preset=preset, upsample=(coord_scale == 1.0))
    fwd = flow_video(frames_ext, **flow_kw)  # (Tc,): ext[i] → ext[i+1]
    bwd = jnp.flip(flow_video(jnp.flip(frames_ext, axis=0), **flow_kw), axis=0)
    # bwd[i]: ext[i+1] → ext[i]

    # forward hop INTO chunk[i]: source ext[i] = prev_last (i=0) or chunk[i-1]
    src_boxes = jnp.concatenate([prev_rois[None], rois[:-1]], axis=0)
    src_scores = jnp.concatenate(
        [prev_scores[None], cls_scores[:-1]], axis=0
    )
    src_keep = jnp.concatenate([prev_keep[None], keep[:-1]], axis=0)
    src_mask = jnp.any(src_keep, axis=1)  # (Tc, R)
    shifts = jax.vmap(mean_flow_in_boxes)(
        fwd, src_boxes * coord_scale, src_mask
    )
    fwd_boxes = shift_boxes(src_boxes, shifts)
    fwd_scores = src_scores * decay
    fwd_valid = src_keep

    # backward hop INTO chunk[i]: source chunk[i+1] via bwd[i+1]; the last
    # frame has no in-chunk future source (causal deviation, see module doc)
    nsrc_boxes = jnp.concatenate([rois[1:], jnp.zeros((1, R, 4))], axis=0)
    nsrc_scores = jnp.concatenate(
        [cls_scores[1:], jnp.zeros_like(cls_scores[:1])], axis=0
    )
    nsrc_keep = jnp.concatenate(
        [keep[1:], jnp.zeros_like(keep[:1])], axis=0
    )
    nsrc_mask = jnp.any(nsrc_keep, axis=1)
    bflow = jnp.concatenate([bwd[1:], jnp.zeros_like(bwd[:1])], axis=0)
    bshifts = jax.vmap(mean_flow_in_boxes)(
        bflow, nsrc_boxes * coord_scale, nsrc_mask
    )
    bwd_boxes = shift_boxes(nsrc_boxes, bshifts)
    bwd_scores = nsrc_scores * decay
    bwd_valid = nsrc_keep

    m_boxes = jnp.concatenate([rois, fwd_boxes, bwd_boxes], axis=1)
    m_scores = jnp.concatenate([cls_scores, fwd_scores, bwd_scores], axis=2)
    m_valid = jnp.concatenate([keep, fwd_valid, bwd_valid], axis=2)
    return m_boxes, m_scores, m_valid


def make_stream_chunk_fn(det_model, trk_model, trk_cfg, opts: StreamOptions):
    """Build the fused one-dispatch-per-chunk program (engine="fused").

    Returns ``(step, unpack)``: ``step(det_params, trk_params, frames, rois,
    tc_valid, halo_frame, carry) -> (carry', halo', packed)`` is jitted;
    ``unpack(np.asarray(packed))`` yields the host-output dict. The carry
    (slot templates/boxes/alive, previous chunk's last-frame det state, the
    previous chunk's tracker features, the next MGP halo frame) never leaves
    the device; all host outputs travel in ONE flat f32 buffer so a chunk
    costs one dispatch + one transfer on high-latency links.

    Semantics are bit-identical to the host loop in :func:`stream_video`:
    the greedy seeding scan replicates the host's stable-sort walk (argmax
    ties = lowest flat index = (frame asc, slot asc)), coverage and clash
    checks use the same strict-> IoU tests, and free slots are claimed in
    ascending index order exactly like ``free.pop(0)``.
    """
    from vdetlib_tpu.geometry.boxes import pairwise_iou
    from vdetlib_tpu.kernels.nms import batched_nms

    A, R, C = opts.track_slots, opts.max_rois, opts.num_classes
    Tc = opts.chunk
    N = 3 * R if opts.mgp else R
    s = int(opts.track_stride)
    if s > 1 and (s != 2 or Tc % s):
        raise ValueError("streaming track_stride supports 1 and 2; chunk must divide")
    Ts = Tc // s  # samples per chunk (== Tc at stride 1)
    Tw = Ts  # retained prev-chunk window length, in SAMPLES

    out_spec = [
        ("out_boxes", (Tc, N, 4)),
        ("out_scores", (Tc, C - 1, N)),
        ("out_keep", (Tc, C - 1, N)),
        ("tb", (A, Tc, 4)),
        ("tc", (A, Tc)),
        ("ta", (A, Tc)),
        ("seed_slot", (A,)),
        ("seed_ti", (A,)),
        ("seed_box", (A, 4)),
        ("seed_score", (A,)),
        ("seed_ok", (A,)),
        ("bb", (A, 2 * Ts, 4)),
        ("balive", (A, 2 * Ts)),
        # boundary fill for the PREVIOUS chunk's trailing skipped frame
        # (track_stride > 1 only; zeros at stride 1)
        ("bf_box", (A, 4)),
        ("bf_conf", (A,)),
        ("bf_alive", (A,)),
    ]

    def unpack(flat: np.ndarray) -> dict:
        out, off = {}, 0
        for name, shape in out_spec:
            size = int(np.prod(shape))
            out[name] = flat[off : off + size].reshape(shape)
            off += size
        return out

    def fn(det_params, trk_params, frames, rois, tc_valid, halo_frame, carry):
        (slot_templates, slot_boxes, slot_alive,
         prev_rois, prev_scores, prev_keep, prev_feats, has_prev,
         bnd_box, bnd_conf, bnd_alive) = carry

        # --- detection + NMS (host loop step 1) ---
        probs, boxes = _detect_step(det_model, det_params, frames, rois, True)
        cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2)  # (Tc, C-1, R)
        cls_boxes = jnp.swapaxes(boxes[:, :, 1:, :], 1, 2)
        keep = batched_nms(
            cls_boxes, cls_scores, cls_scores > 0.01, opts.nms_thresh
        )

        # --- motion-guided propagation (one-frame halo) ---
        if opts.mgp:
            frames_ext = jnp.concatenate([halo_frame[None], frames], axis=0)
            m_boxes, m_scores, m_valid = _mgp_chunk(
                frames_ext, rois, cls_scores, keep,
                prev_rois, prev_scores, prev_keep, opts.mgp_decay,
                preset=opts.flow_preset,
            )
            m_keep = batched_nms(
                jnp.broadcast_to(
                    m_boxes[:, None], (Tc, C - 1) + m_boxes.shape[1:]
                ),
                m_scores,
                m_valid & (m_scores > 0),
                opts.nms_thresh,
            )
            out_boxes, out_scores, out_keep = m_boxes, m_scores, m_keep
        else:
            out_boxes, out_scores, out_keep = rois, cls_scores, keep

        # --- tracking: advance carried slots ---
        # optimization_barriers pin the tracker subcomputations to the same
        # fusion boundaries the host engine's standalone jits have: without
        # them XLA fuses feats/NCC math with other consumers, and last-ulp
        # bf16 pooling differences amplify chaotically through the
        # sequential scan (measured: up to 6 px box drift by 30 frames).
        feats = jax.lax.optimization_barrier(
            tracker_features(trk_model, trk_params, frames[::s] if s > 1 else frames)
        )
        if s > 1:
            (tb, tc_, ta, box_end, conf_end, alive_end, tpl_end,
             bf_box, bf_conf, bf_alive) = jax.lax.optimization_barrier(
                track_chunk_strided(
                    trk_cfg, feats, slot_templates, slot_boxes, slot_alive,
                    bnd_box, bnd_conf, bnd_alive, opts.conf_thresh, s, Tc,
                )
            )
        else:
            tb, tc_, ta, box_end, alive_end, tpl_end = jax.lax.optimization_barrier(
                track_chunk(
                    trk_cfg, feats, slot_templates, slot_boxes, slot_alive,
                    opts.conf_thresh,
                )
            )
            conf_end = tc_[:, -1]
            bf_box = jnp.zeros((A, 4), jnp.float32)
            bf_conf = jnp.zeros((A,), jnp.float32)
            bf_alive = jnp.zeros((A,), bool)

        # --- device greedy seeding (host loop's stable-sort walk) ---
        best_scores = jnp.max(
            jnp.where(
                jnp.swapaxes(out_keep, 1, 2),
                jnp.swapaxes(out_scores, 1, 2),
                0.0,
            ),
            axis=2,
        )  # (Tc, N)
        iou_atn = jax.vmap(
            lambda boxes_k: jax.vmap(pairwise_iou)(
                boxes_k[:, None], out_boxes
            )[:, 0]
        )(tb)  # (A, Tc, N)
        cov0 = jnp.any(
            (iou_atn > opts.cover_thresh) & ta[:, :, None], axis=0
        )  # (Tc, N)

        F = Tc * N
        b_flat = out_boxes.reshape(F, 4)
        s_flat = best_scores.reshape(F)
        t_flat = jnp.arange(F, dtype=jnp.int32) // N
        slot_ar = jnp.arange(F)
        avail0 = (~cov0.reshape(F)) & (t_flat < tc_valid)
        free = ~alive_end  # (A,) — free list BEFORE seeding, like the host
        n_free = jnp.sum(free, dtype=jnp.int32)
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (A,)
        arange_a = jnp.arange(A, dtype=jnp.int32)

        # dummy-row-extended slot state for masked scatters (tpl_end ==
        # slot_templates unless template_eta > 0 — EMA-adapted carry)
        templates_x = jnp.concatenate(
            [tpl_end, jnp.zeros_like(tpl_end[:1])], axis=0
        )
        sboxes_x = jnp.concatenate([box_end, jnp.zeros_like(box_end[:1])], 0)
        salive_x = jnp.concatenate(
            [alive_end, jnp.zeros_like(alive_end[:1])], 0
        )

        def seed_step(carry_s, _):
            avail, count, sboxes, salive = carry_s
            s = jnp.where(avail, s_flat, -jnp.inf)
            i = jnp.argmax(s)  # ties: first max = (frame asc, slot asc)
            ok = (s[i] >= opts.seed_thresh) & (count < n_free)
            cand = b_flat[i]
            ti = t_flat[i]
            slot = jnp.sum(jnp.where(free & (free_rank == count), arange_a, 0))
            slot = jnp.where(ok, slot, A)  # dummy row when not seeding
            sboxes = sboxes.at[slot].set(cand)
            salive = salive.at[slot].set(True)
            clash = (t_flat == ti) & (
                pairwise_iou(cand[None], b_flat)[0] > opts.cover_thresh
            )
            avail = jnp.where(ok, avail & ~clash & (slot_ar != i), avail)
            count = count + ok.astype(jnp.int32)
            rec = (
                jnp.where(ok, slot, -1).astype(jnp.int32),
                ti,
                cand,
                s[i],
                ok,
            )
            return (avail, count, sboxes, salive), rec

        (_, _, sboxes_x, salive_x), recs = jax.lax.scan(
            seed_step,
            (avail0, jnp.int32(0), sboxes_x, salive_x),
            None,
            length=A,
        )
        seed_slot, seed_ti, seed_box, seed_score, seed_ok = recs

        # template extraction hoisted OUT of the seeding scan (the scan never
        # reads templates): inside the scan body XLA fuses the feats gather
        # with scan-body neighbors and the resulting last-ulp differences
        # amplify chaotically through the next chunks' NCC rollout (measured:
        # 1e-6 template diff → 6 px box drift by 30 frames). The SAME
        # _extract_templates_core (barriered here, jitted standalone in the
        # host engine) compiles bit-identically in both contexts.
        # at track_stride > 1, feats holds SAMPLES only: snap the seed frame
        # to its nearest real sample (template content + backtrack anchor),
        # exactly like track_batch snaps anchors — the seed's box and its
        # recorded frame stay the original ti
        seed_ti_ex = _snap_sample(seed_ti, tc_valid, s) if s > 1 else seed_ti
        new_tmpl = jax.lax.optimization_barrier(
            _extract_templates_core(feats, seed_ti_ex, seed_box, trk_cfg)
        )
        scat = jnp.where(seed_ok, seed_slot, A)
        templates_x = templates_x.at[scat].set(
            jnp.where(seed_ok[:, None, None, None], new_tmpl, 0.0)
        )
        new_templates = templates_x[:A]
        new_boxes = sboxes_x[:A]
        new_alive = salive_x[:A]

        # --- backward re-tracking of fresh seeds over the window ---
        if opts.backtrack:
            window = jnp.concatenate(
                [
                    jnp.where(has_prev, prev_feats, jnp.zeros_like(feats)),
                    feats,
                ],
                axis=0,
            )
            anchor_ts_x = jnp.zeros((A + 1,), jnp.int32)
            anchor_boxes_x = jnp.zeros((A + 1, 4), jnp.float32)
            lane_on_x = jnp.zeros((A + 1,), bool)
            scat = jnp.where(seed_ok, seed_slot, A)
            anchor_ts_x = anchor_ts_x.at[scat].set(Tw + seed_ti_ex)
            anchor_boxes_x = anchor_boxes_x.at[scat].set(seed_box)
            lane_on_x = lane_on_x.at[scat].set(seed_ok)
            bb, balive = jax.lax.optimization_barrier(
                backtrack_seeds(
                    trk_cfg, window, anchor_ts_x[:A], anchor_boxes_x[:A],
                    new_templates, lane_on_x[:A], opts.conf_thresh,
                )
            )
        else:
            bb = jnp.zeros((A, 2 * Ts, 4), jnp.float32)
            balive = jnp.zeros((A, 2 * Ts), bool)

        # --- next-chunk carry (device-resident) ---
        last = tc_valid - 1
        carry_out = (
            new_templates,
            new_boxes,
            new_alive,
            rois[last],
            cls_scores[last],
            keep[last],
            feats,
            jnp.asarray(True),
            # scan-end snapshot (PRE-seeding): the left neighbor of the next
            # chunk's boundary fill. A slot re-seeded this chunk has
            # alive_end False here, so its boundary fill is gated off — the
            # fill belongs to the slot's PREVIOUS occupant.
            box_end,
            conf_end,
            alive_end,
        )
        halo_out = frames[last]

        outs = dict(
            out_boxes=out_boxes,
            out_scores=out_scores,
            out_keep=out_keep,
            tb=tb,
            tc=tc_,
            ta=ta,
            seed_slot=seed_slot,
            seed_ti=seed_ti,
            seed_box=seed_box,
            seed_score=seed_score,
            seed_ok=seed_ok,
            bb=bb,
            balive=balive,
            bf_box=bf_box,
            bf_conf=bf_conf,
            bf_alive=bf_alive,
        )
        packed = jnp.concatenate(
            [outs[name].astype(jnp.float32).reshape(-1) for name, _ in out_spec]
        )
        return carry_out, halo_out, packed

    return jax.jit(fn), unpack


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
      dict with per-frame detection arrays (boxes/scores/keep — slot axis is
      3R when opts.mgp else R), seq-NMS scores + path ids, and per-slot
      track segments.
    """
    if opts.engine == "fused":
        return _stream_video_fused(
            det_model, det_params, trk_model, trk_params, trk_cfg,
            frame_chunks, rois_per_frame, opts,
        )
    metrics = StageMetrics("stream")
    A = opts.track_slots
    R = opts.max_rois
    C = opts.num_classes
    P = trk_cfg.template_pool
    Cf = trk_cfg.out_features
    s = int(opts.track_stride)
    if s > 1 and (s != 2 or opts.chunk % s):
        raise ValueError("streaming track_stride supports 1 and 2; chunk must divide")

    slot_templates = jnp.zeros((A, P, P, Cf), jnp.float32)
    slot_boxes = jnp.zeros((A, 4), jnp.float32)
    slot_alive = jnp.zeros((A,), bool)
    slot_id = -np.ones(A, np.int64)  # global track ids per slot
    next_track_id = 0
    # scan-end snapshot (pre-seeding) of the previous chunk — the left
    # neighbor of the boundary fill at track_stride > 1
    bnd_box = np.zeros((A, 4), np.float32)
    bnd_conf = np.zeros((A,), np.float32)
    bnd_alive = np.zeros((A,), bool)
    pending = False  # a full chunk's last frame awaits its boundary fill

    all_boxes, all_scores, all_keep = [], [], []
    track_segments: dict[int, list] = {}
    t_global = 0
    prev_feats = None  # previous chunk's tracker features (backtrack window)
    prev_last_frame = None  # previous chunk's final frame (MGP halo)
    prev_rois = np.zeros((R, 4), np.float32)
    prev_cls_scores = np.zeros((C - 1, R), np.float32)
    prev_keep = np.zeros((C - 1, R), bool)

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

        # --- motion-guided propagation (t±1, one-frame halo) ---
        if opts.mgp:
            halo = (
                chunk[:1] if prev_last_frame is None else prev_last_frame[None]
            )
            frames_ext = jnp.asarray(
                np.concatenate([halo, chunk], axis=0)
            )
            m_boxes, m_scores, m_valid = _mgp_chunk(
                frames_ext, rois_j, cls_scores, keep,
                jnp.asarray(prev_rois), jnp.asarray(prev_cls_scores),
                jnp.asarray(prev_keep), opts.mgp_decay,
                preset=opts.flow_preset,
            )
            m_keep = batched_nms(
                jnp.broadcast_to(
                    m_boxes[:, None], (opts.chunk, C - 1) + m_boxes.shape[1:]
                ),
                m_scores,
                m_valid & (m_scores > 0),
                opts.nms_thresh,
            )
            out_boxes, out_scores, out_keep = m_boxes, m_scores, m_keep
            prev_rois = rois[Tc - 1]
            prev_cls_scores = np.asarray(cls_scores)[Tc - 1]
            prev_keep = np.asarray(keep)[Tc - 1]
            prev_last_frame = chunk[Tc - 1]
        else:
            out_boxes, out_scores, out_keep = rois_j, cls_scores, keep

        # --- tracking: advance carried slots over this chunk ---
        feats = tracker_features(
            trk_model, trk_params, frames_j[::s] if s > 1 else frames_j
        )
        if s > 1:
            (tb, tc_, ta, box_end, conf_end, alive_end, tpl_end,
             bf_box, bf_conf, bf_alive) = track_chunk_strided(
                trk_cfg, feats, slot_templates, slot_boxes, slot_alive,
                jnp.asarray(bnd_box), jnp.asarray(bnd_conf),
                jnp.asarray(bnd_alive), opts.conf_thresh, s, opts.chunk,
            )
            # boundary fill: the PREVIOUS chunk's last frame, now that its
            # right neighbor (this chunk's first sample) exists
            if pending:
                bf_box_np = np.asarray(bf_box)
                bf_conf_np = np.asarray(bf_conf)
                bf_alive_np = np.asarray(bf_alive)
                for a in range(A):
                    if bf_alive_np[a] and slot_id[a] >= 0:
                        track_segments.setdefault(int(slot_id[a]), []).append(
                            (t_global - 1, bf_box_np[a], float(bf_conf_np[a]))
                        )
            bnd_box = np.asarray(box_end)
            bnd_conf = np.asarray(conf_end)
            bnd_alive = np.asarray(alive_end)
        else:
            tb, tc_, ta, box_end, alive_end, tpl_end = track_chunk(
                trk_cfg, feats, slot_templates, slot_boxes, slot_alive,
                opts.conf_thresh,
            )
        slot_boxes, slot_alive = box_end, alive_end
        slot_templates = tpl_end  # identity unless cfg.template_eta > 0
        tb_np, ta_np, tc_np = np.asarray(tb), np.asarray(ta), np.asarray(tc_)
        # at track_stride > 1, a FULL chunk's last frame is pending (its
        # interpolation needs the next chunk's first sample); it is emitted
        # next chunk as the boundary fill, or held at end of stream
        pend_local = opts.chunk - 1 if (s > 1 and Tc == opts.chunk) else None
        pending = pend_local is not None
        for a in range(A):
            if slot_id[a] < 0:
                continue
            seg = track_segments.setdefault(int(slot_id[a]), [])
            for i in range(Tc):
                if i == pend_local:
                    continue
                if ta_np[a, i]:
                    seg.append((t_global + i, tb_np[a, i], float(tc_np[a, i])))

        # --- seed new tracks from this chunk's top uncovered detections ---
        scores_np = np.asarray(out_scores)
        keep_np = np.asarray(out_keep)
        boxes_np = np.asarray(out_boxes)  # (Tc, N, 4)
        N = boxes_np.shape[1]
        best_scores = np.where(
            np.moveaxis(keep_np, 1, 2), np.moveaxis(scores_np, 1, 2), 0.0
        ).max(axis=2)  # (Tc, N)
        flat = np.argsort(-best_scores.ravel(), kind="stable")
        free = [a for a in range(A) if not bool(np.asarray(slot_alive)[a])]
        seeded = []
        seed_lanes = []  # (slot, ti, box, track_id) for backward re-tracking
        for fi in flat:
            if not free:
                break
            ti, ri = divmod(int(fi), N)
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
            slot_boxes = slot_boxes.at[a].set(jnp.asarray(cand))
            slot_alive = slot_alive.at[a].set(True)
            slot_id[a] = next_track_id
            track_segments[next_track_id] = [
                (t_global + ti, cand.copy(), float(best_scores[ti, ri]))
            ]
            seed_lanes.append((a, ti, cand.copy(), next_track_id))
            next_track_id += 1
            seeded.append((ti, ri))

        # batched template extraction for this chunk's seeds, padded to A
        # lanes — the SAME compiled program as the fused engine's (see
        # _extract_templates_core; eager per-seed extraction rounds
        # differently and the NCC rollout amplifies last-ulp diffs to px)
        if seed_lanes:
            ti_arr = np.zeros(A, np.int32)
            bx_arr = np.zeros((A, 4), np.float32)
            for k, (a, ti, cand, _) in enumerate(seed_lanes):
                # strided feats hold SAMPLES only: snap to the nearest real
                # sample (same rule as the fused program / batch anchors)
                ti_arr[k] = _snap_sample(ti, Tc, s) if s > 1 else ti
                bx_arr[k] = cand
            tmpl = _extract_templates_batch(
                feats, jnp.asarray(ti_arr), jnp.asarray(bx_arr), trk_cfg
            )
            for k, (a, ti, cand, _) in enumerate(seed_lanes):
                slot_templates = slot_templates.at[a].set(tmpl[k])

        # --- backward re-tracking of fresh seeds over the window ---
        if opts.backtrack and seed_lanes:
            Tw = opts.chunk // s  # retained prev-chunk length, in SAMPLES
            window = (
                jnp.concatenate([prev_feats, feats], axis=0)
                if prev_feats is not None
                else jnp.concatenate([jnp.zeros_like(feats), feats], axis=0)
            )
            anchor_ts = np.zeros(A, np.int32)
            anchor_boxes = np.zeros((A, 4), np.float32)
            lane_on = np.zeros(A, bool)
            lane_track = {}
            lane_seed = {}
            for a, ti, box, tid in seed_lanes:
                anchor_ts[a] = Tw + (
                    _snap_sample(ti, Tc, s) if s > 1 else ti
                )
                anchor_boxes[a] = box
                lane_on[a] = True
                lane_track[a] = tid
                lane_seed[a] = (ti, box)
            bb, balive = backtrack_seeds(
                trk_cfg, window, jnp.asarray(anchor_ts),
                jnp.asarray(anchor_boxes), slot_templates,
                jnp.asarray(lane_on), opts.conf_thresh,
            )
            bb_np, ba_np = np.asarray(bb), np.asarray(balive)
            for a, tid in lane_track.items():
                seg = track_segments[tid]
                if s > 1:
                    ti, sbox = lane_seed[a]
                    seg.extend(
                        _backtrack_entries_strided(
                            bb_np[a], ba_np[a], t_global, opts.chunk, s,
                            ti, sbox,
                        )
                    )
                else:
                    for j in range(2 * opts.chunk):
                        # window position j maps to global frame:
                        #   j <  Tw: prev chunk frame (t_global - Tw + j)
                        #   j >= Tw: current chunk frame (t_global + j - Tw)
                        t_abs = (t_global - Tw) + j
                        if not ba_np[a, j] or t_abs < 0:
                            continue
                        seg.append((t_abs, bb_np[a, j], 0.0))
                seg.sort(key=lambda e: e[0])

        all_boxes.append(boxes_np[:Tc])
        all_scores.append(scores_np[:Tc])
        all_keep.append(keep_np[:Tc])
        t_global += Tc
        prev_feats = feats

    if pending:
        # end of stream: the final full chunk's last frame has no right
        # neighbor — hold the last sample (the batch stride end rule)
        for a in range(A):
            if bnd_alive[a] and slot_id[a] >= 0:
                track_segments.setdefault(int(slot_id[a]), []).append(
                    (t_global - 1, bnd_box[a].copy(), float(bnd_conf[a]))
                )
    return _finalize_stream(
        all_boxes, all_scores, all_keep, track_segments, t_global, opts, metrics
    )


def _finalize_stream(
    all_boxes, all_scores, all_keep, track_segments, t_global, opts, metrics
):
    """Global seq-NMS over the collected arrays + result dict.

    Shared tail of both engines so linking/rescoring is one code path —
    exact, since it needs only boxes and scores, not frames (module doc).
    """
    boxes_full = np.concatenate(all_boxes, axis=0)  # (T, N, 4)
    scores_full = np.concatenate(all_scores, axis=0)  # (T, C-1, N)
    keep_full = np.concatenate(all_keep, axis=0)
    seq_scores, path_ids = seq_nms_batch(
        jnp.asarray(boxes_full),
        jnp.asarray(np.moveaxis(scores_full, 1, 0)),  # (C-1, T, N)
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


def _stream_video_fused(
    det_model,
    det_params,
    trk_model,
    trk_params,
    trk_cfg,
    frame_chunks: Iterator[np.ndarray],
    rois_per_frame,
    opts: StreamOptions,
):
    """Fused streaming engine: ONE dispatch + ONE transfer per chunk.

    Host driver around :func:`make_stream_chunk_fn`: iterates chunks,
    threads the device-resident carry + MGP halo frame, unpacks the single
    packed output buffer, and performs the host-only bookkeeping the fused
    program cannot (global track-id assignment, segment assembly). Output
    parity with the host loop is locked by
    tests/test_stream.py::test_fused_engine_matches_host and the
    randomized differential corpus
    (testing/differential.py::run_stream_agreement_case).
    """
    metrics = StageMetrics("stream")
    A, R, C = opts.track_slots, opts.max_rois, opts.num_classes
    P, Cf = trk_cfg.template_pool, trk_cfg.out_features
    s = int(opts.track_stride)
    step, unpack = make_stream_chunk_fn(det_model, trk_model, trk_cfg, opts)

    slot_id = -np.ones(A, np.int64)  # global track ids per slot
    next_track_id = 0
    all_boxes, all_scores, all_keep = [], [], []
    track_segments: dict[int, list] = {}
    t_global = 0
    carry = None
    halo = None
    pending = False  # a full chunk's last frame awaits its boundary fill

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
        if carry is None:
            feat_s = jax.eval_shape(
                lambda f: tracker_features(trk_model, trk_params, f),
                frames_j[::s] if s > 1 else frames_j,
            )
            carry = (
                jnp.zeros((A, P, P, Cf), jnp.float32),  # slot templates
                jnp.zeros((A, 4), jnp.float32),  # slot boxes
                jnp.zeros((A,), bool),  # slot alive
                jnp.zeros((R, 4), jnp.float32),  # prev last-frame rois
                jnp.zeros((C - 1, R), jnp.float32),  # prev last-frame scores
                jnp.zeros((C - 1, R), bool),  # prev last-frame keep
                jnp.zeros(feat_s.shape, feat_s.dtype),  # prev chunk features
                jnp.asarray(False),  # has_prev
                jnp.zeros((A, 4), jnp.float32),  # scan-end boxes (boundary)
                jnp.zeros((A,), jnp.float32),  # scan-end conf
                jnp.zeros((A,), bool),  # scan-end alive
            )
            halo = frames_j[0]  # host loop: halo = chunk[:1] on first chunk
        carry, halo, packed = step(
            det_params, trk_params, frames_j, jnp.asarray(rois),
            jnp.int32(Tc), halo, carry,
        )
        out = unpack(np.asarray(packed))

        # --- boundary fill: the PREVIOUS chunk's last frame (stride > 1) ---
        if pending:
            for a in range(A):
                if out["bf_alive"][a] > 0.5 and slot_id[a] >= 0:
                    track_segments.setdefault(int(slot_id[a]), []).append(
                        (t_global - 1, out["bf_box"][a].copy(),
                         float(out["bf_conf"][a]))
                    )

        # --- carried-slot segments (exactly the host loop's bookkeeping) ---
        tb, ta, tcs = out["tb"], out["ta"] > 0.5, out["tc"]
        pend_local = opts.chunk - 1 if (s > 1 and Tc == opts.chunk) else None
        pending = pend_local is not None
        for a in range(A):
            if slot_id[a] < 0:
                continue
            seg = track_segments.setdefault(int(slot_id[a]), [])
            for i in range(Tc):
                if i == pend_local:
                    continue
                if ta[a, i]:
                    seg.append((t_global + i, tb[a, i], float(tcs[a, i])))

        # --- global track ids for this chunk's seeds, in scan (score) order ---
        seed_lane_track = {}
        seed_lane_seed = {}
        for k in range(A):
            if out["seed_ok"][k] <= 0.5:
                continue
            a = int(out["seed_slot"][k])
            ti = int(out["seed_ti"][k])
            slot_id[a] = next_track_id
            track_segments[next_track_id] = [
                (t_global + ti, out["seed_box"][k].copy(),
                 float(out["seed_score"][k]))
            ]
            seed_lane_track[a] = next_track_id
            seed_lane_seed[a] = (ti, out["seed_box"][k].copy())
            next_track_id += 1

        # --- attach backward re-tracked window entries to fresh seeds ---
        if opts.backtrack and seed_lane_track:
            Tw = opts.chunk // s  # retained prev-chunk length, in SAMPLES
            for a, tid in seed_lane_track.items():
                seg = track_segments[tid]
                if s > 1:
                    ti = int(seed_lane_seed[a][0])
                    sbox = seed_lane_seed[a][1]
                    seg.extend(
                        _backtrack_entries_strided(
                            out["bb"][a], out["balive"][a] > 0.5,
                            t_global, opts.chunk, s, ti, sbox,
                        )
                    )
                else:
                    for j in range(2 * opts.chunk):
                        t_abs = (t_global - Tw) + j
                        if out["balive"][a, j] <= 0.5 or t_abs < 0:
                            continue
                        seg.append((t_abs, out["bb"][a, j], 0.0))
                seg.sort(key=lambda e: e[0])

        all_boxes.append(out["out_boxes"][:Tc])
        all_scores.append(out["out_scores"][:Tc])
        all_keep.append(out["out_keep"][:Tc] > 0.5)
        t_global += Tc

    if pending:
        # end of stream: the final full chunk's last frame has no right
        # neighbor — hold the scan-end sample (one small end-of-stream
        # transfer of the boundary carry; the batch stride end rule). A slot
        # re-seeded in the final chunk has scan-end alive False, so the hold
        # never lands on the wrong occupant.
        bnd_box = np.asarray(carry[8])
        bnd_conf = np.asarray(carry[9])
        bnd_alive = np.asarray(carry[10])
        for a in range(A):
            if bnd_alive[a] and slot_id[a] >= 0:
                track_segments.setdefault(int(slot_id[a]), []).append(
                    (t_global - 1, bnd_box[a].copy(), float(bnd_conf[a]))
                )
    return _finalize_stream(
        all_boxes, all_scores, all_keep, track_segments, t_global, opts, metrics
    )


def stream_to_protos(
    result: dict,
    frame_ids,
    video: str,
    class_names=None,
    min_score: float = 0.0,
) -> tuple[dict, dict, dict]:
    """Collected stream arrays → wire protos [B json:5 JSON interface].

    Returns (final det_proto, tubelet track_proto, online-tracker
    track_proto). Emission matches the batch link stage
    (video/link.py::seq_nms_video): surviving slots carry the seq-NMS path
    statistic, tubelets are one track per (class, path id). The online
    tracker's segments become a separate track_proto (method
    ``stream_tracker``) — the streaming analog of the track stage's output.
    """
    from vdetlib_tpu.protos.arrays import arrays_to_det_proto
    from vdetlib_tpu.video.link import tubelets_from_path_ids

    boxes = np.asarray(result["boxes"])  # (T, N, 4)
    seq_scores = np.asarray(result["seq_scores"])  # (C-1, T, N)
    path_ids = np.asarray(result["path_ids"])
    T, N = boxes.shape[:2]
    assert len(frame_ids) == T, (len(frame_ids), T)
    C = seq_scores.shape[0] + 1
    new_scores = np.zeros((T, N, C), np.float32)
    new_scores[:, :, 1:] = np.moveaxis(np.maximum(seq_scores, 0.0), 0, 2)
    mask = np.asarray(result["keep"]).any(axis=1)  # (T, N)
    det_proto = arrays_to_det_proto(
        boxes, new_scores, mask, frame_ids, video,
        class_names=class_names, score_thresh=min_score,
    )
    tubelets = tubelets_from_path_ids(
        boxes, seq_scores, path_ids, frame_ids, video, first_class=1
    )
    tracks = []
    for tid in sorted(result["tracks"]):
        entries = [
            {
                "frame": int(frame_ids[t]),
                "bbox": [float(v) for v in np.asarray(b)],
                "score": float(s),
            }
            for t, b, s in result["tracks"][tid]
            if 0 <= t < T
        ]
        if entries:
            tracks.append(entries)
    track_proto = {"video": video, "method": "stream_tracker", "tracks": tracks}
    return det_proto, tubelets, track_proto
