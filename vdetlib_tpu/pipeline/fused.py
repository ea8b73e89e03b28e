"""Fused device pipeline — the whole T-CNN flow as ONE jitted program.

The staged runner (pipeline/runner.py) preserves the reference's
JSON-protos-at-every-boundary contract; this module is the production serving
path: the SAME stage semantics (detection → per-class NMS budget →
optical-flow MGP merge + dedup → greedy-anchor correlation tracking →
tubelet rescoring → seq-NMS linking) compiled into a single XLA program, so a
whole snippet is processed device-resident with one dispatch.

Fidelity contract: every stage core here is the same math the staged path
runs (``_detect_step``, ``_propagate_hop``, ``rescore_arrays``,
``seq_nms_batch``), composed with device equivalents of the proto⇄array
bridges (slot packing with file-order budget truncation replicates
``det_proto_to_arrays``; the greedy anchor rounds replicate
``video/track.py::track_from_det``'s host loop). tests/test_fused_parity.py
asserts the fused program's final det proto equals the staged stages'.

TPU-first design notes:
- The det set is slot-packed: each slot = one (box, class, score) entry, the
  exact layout of ``protos/arrays.py``. Budget truncation is a masked cumsum
  rank + scatter (no host compaction).
- Per-class NMS dedup after MGP exploits one-class-per-slot: ONE fixpoint on
  the block-diagonal adjacency (kernels/nms.py::nms_grouped) instead of a
  per-class broadcast — ~(C-1)× less IoU work.
- Greedy anchor selection runs as a ``lax.while_loop`` of rounds; each round
  is an A-step masked-argmax scan (exact tie/clash semantics of the host
  loop) + one batched fwd+bwd tracker scan + a batched coverage update.

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

from vdetlib_tpu.geometry.boxes import pairwise_iou
from vdetlib_tpu.kernels.flow import flow_coord_scale, flow_video
from vdetlib_tpu.kernels.nms import nms_grouped
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.video.detect import _detect_step
from vdetlib_tpu.video.mgp import _propagate_hop
from vdetlib_tpu.video.rescore import rescore_arrays
from vdetlib_tpu.video.track import track_batch, tracker_features


@dataclass(frozen=True)
class FusedConfig:
    """Matched 1:1 with the staged stage options (pipeline/runner.py)."""

    image_hw: tuple = (240, 320)
    detect_batch: int = 16  # DetectOptions.batch_size
    feat_batch: int = 16  # TrackOptions.batch_size
    # detect
    score_thresh: float = 0.005  # DetectOptions.score_thresh
    # mgp
    mgp_window: int = 1  # MGPOptions.window
    mgp_decay: float = 0.9  # MGPOptions.score_decay
    nms_thresh: float = 0.3  # MGPOptions.nms_thresh
    det_budget: int = 64  # MGPOptions.max_boxes
    out_budget: int = 64  # RescoreOptions/LinkOptions.max_boxes
    # track
    max_tracks: int = 32  # TrackOptions.max_tracks
    anchors_per_round: int = 8  # TrackOptions.anchors_per_round
    anchor_thresh: float = 0.3  # TrackOptions.anchor_thresh
    track_conf: float = 0.5  # TrackOptions.conf_thresh
    cover_thresh: float = 0.5  # TrackOptions.cover_thresh
    snap_weight: float = 0.0  # TrackOptions.snap_weight (0 = off)
    snap_iou: float = 0.5  # TrackOptions.snap_iou
    track_stride: int = 2  # TrackOptions.frame_stride (default 2 — see there)
    # rescore
    rescore_match: float = 0.5  # RescoreOptions.match_thresh
    top_ratio: float = 0.5
    boost: str = "max"
    bg_decay: float = 1.0
    min_matched_frac: float = 0.0  # RescoreOptions.min_matched_frac
    stat_floor: int = 0  # RescoreOptions.stat_floor (length prior)
    # seq-NMS link
    link_thresh: float = 0.5
    suppress_thresh: float = 0.3
    max_paths: int = 100
    link_rescore: str = "avg"
    # tubelet boxes as detections (RescoreOptions.tubelet_boxes)
    tubelet_boxes: bool = False
    # flow
    flow_preset: str = "fastest"
    flow_levels: int = 3
    flow_search: int = 3


class FusedOutput(NamedTuple):
    det_boxes: jax.Array  # (T, Nb, 4) post-MGP-NMS compacted slot boxes
    det_scores: jax.Array  # (T, Nb, C) rescored (pre-link) slot score vectors
    det_mask: jax.Array  # (T, Nb)
    final_scores: jax.Array  # (C-1, T, Nb) seq-NMS out (-1 = suppressed)
    path_ids: jax.Array  # (C-1, T, Nb) tubelet path ids (-1 = none)
    track_boxes: jax.Array  # (K, T, 4)
    track_conf: jax.Array  # (K, T)
    track_alive: jax.Array  # (K, T)
    n_tracks: jax.Array  # () int32
    tubelet_stats: jax.Array  # (K, C) rescoring per-track per-class stats


def _compact_by_rank(idx, budget, *arrays):
    """Scatter flat per-frame slots to their file-order rank (device compaction).

    idx: (T, M) target slot per entry — its rank among kept entries, or
    ``budget`` for dropped ones (those land in a dummy slot that is sliced
    off). Replicates ``det_proto_to_arrays``'s "first ``max_boxes`` entries
    per frame in file order".
    """

    def one_frame(ix, arrs):
        return tuple(
            jnp.zeros((budget + 1,) + a.shape[1:], a.dtype).at[ix].set(a)[:budget]
            for a in arrs
        )

    return jax.vmap(one_frame, in_axes=(0, 0))(idx, arrays)


def _rank_mask(mask, budget):
    """File-order budget: keep an entry iff its rank among kept < budget."""
    rank = jnp.cumsum(mask, axis=1) - mask.astype(jnp.int32)  # exclusive
    kept = mask & (rank < budget)
    return kept, jnp.where(kept, rank, budget)


def _make_pipeline_fn(det_model, trk_model, trk_cfg, cfg: FusedConfig):
    H, W = cfg.image_hw
    B = cfg.detect_batch
    A = cfg.anchors_per_round
    K = cfg.max_tracks
    w = cfg.mgp_window

    def pipeline(det_p, trk_p, frames, rois, t_valid=None, roi_mask=None) -> FusedOutput:
        T, R = rois.shape[:2]
        C = det_model.config.num_classes
        # variable-length snippets: T is a padded bucket; frames beyond
        # t_valid are masked out of every decision (bucketed compilation —
        # one executable per bucket instead of one per video length)
        frame_ok = (
            jnp.ones((T,), bool) if t_valid is None else jnp.arange(T) < t_valid
        )
        if roi_mask is None:
            roi_mask = jnp.ones((T, R), bool)

        # ---- detection (config 2; staged: video/detect.py::det_vid) ----
        fr_b = frames.reshape(T // B, B, H, W, 3)
        rs_b = rois.reshape(T // B, B, R, 4)
        probs, reg_boxes = jax.lax.map(
            lambda ab: _detect_step(det_model, det_p, ab[0], ab[1], True),
            (fr_b, rs_b),
        )
        probs = probs.reshape(T, R, C)
        reg_boxes = reg_boxes.reshape(T, R, C, 4)

        # ---- slot packing (staged: det_vid emit + det_proto_to_arrays) ----
        # one entry per (roi, class≥1) with prob ≥ score_thresh, file order
        # (roi-major, class-minor), first det_budget per frame.
        M0 = R * (C - 1)
        s_flat = probs[:, :, 1:].reshape(T, M0)
        b_flat = reg_boxes[:, :, 1:, :].reshape(T, M0, 4)
        cls_flat = jnp.broadcast_to(
            jnp.tile(jnp.arange(1, C, dtype=jnp.int32), R)[None], (T, M0)
        )
        m_flat = (
            (s_flat >= cfg.score_thresh)
            & jnp.repeat(roi_mask, C - 1, axis=1)
            & frame_ok[:, None]
        )
        kept0, idx0 = _rank_mask(m_flat, cfg.det_budget)
        dboxes, dscores, dcls, dmask = _compact_by_rank(
            idx0, cfg.det_budget, b_flat, s_flat, cls_flat, kept0
        )  # (T, N0, ...) — the staged MGP stage's input arrays

        # ---- MGP (config 4a; staged: video/mgp.py::propagate_dets) ----
        N0 = cfg.det_budget
        coord_scale = flow_coord_scale(cfg.flow_preset)
        flow_kw = dict(
            levels=cfg.flow_levels, search=cfg.flow_search,
            preset=cfg.flow_preset, upsample=(coord_scale == 1.0),
        )
        fwd = flow_video(frames, **flow_kw)  # (T-1, H, W, 2): t → t+1
        bwd = jnp.flip(flow_video(jnp.flip(frames, axis=0), **flow_kw), axis=0)
        hop = jax.vmap(lambda f, b, m: _propagate_hop(f, b, m, coord_scale))

        # Every per-slot attribute of a propagated block (boxes, scores,
        # masks, AND classes) must come from the SOURCE frame, shifted by h
        # — slot n at different frames is unrelated (per-frame file-order
        # packing), so reading any attribute at the destination frame
        # scrambles it. This was a real bug for classes: propagated copies
        # inherited the destination slot's class (often a different class or
        # the zero-init of an empty slot), escaped per-class NMS dedup under
        # the wrong group id, and polluted rescoring/seq-NMS with phantom
        # cross-class detections — invisible on synthetic videos whose slot
        # layout repeats every frame, caught on the hard tier (staged
        # 0.6509 vs fused 0.6139 mAP before the fix).
        blk_boxes, blk_scores, blk_mask = [dboxes], [dscores], [dmask]
        blk_cls = [dcls]
        cur_b, cur_m = dboxes, dmask
        for h in range(1, w + 1):  # forward hops: det at t lands at t+h
            nb = hop(fwd, cur_b[:-1], cur_m[:-1])
            cur_b = jnp.concatenate([jnp.zeros((1, N0, 4)), nb], axis=0)
            cur_m = jnp.concatenate([jnp.zeros((1, N0), bool), cur_m[:-1]], axis=0)
            src = jnp.concatenate([jnp.zeros((h, N0)), dscores[:-h]], axis=0)
            blk_boxes.append(cur_b)
            blk_scores.append(src * (cfg.mgp_decay**h))
            blk_mask.append(cur_m & frame_ok[:, None])
            blk_cls.append(
                jnp.concatenate(
                    [jnp.zeros((h, N0), dcls.dtype), dcls[:-h]], axis=0
                )
            )
        cur_b, cur_m = dboxes, dmask
        for h in range(1, w + 1):  # backward hops: det at t lands at t-h
            nb = hop(bwd, cur_b[1:], cur_m[1:])
            cur_b = jnp.concatenate([nb, jnp.zeros((1, N0, 4))], axis=0)
            cur_m = jnp.concatenate([cur_m[1:], jnp.zeros((1, N0), bool)], axis=0)
            src = jnp.concatenate([dscores[h:], jnp.zeros((h, N0))], axis=0)
            blk_boxes.append(cur_b)
            blk_scores.append(src * (cfg.mgp_decay**h))
            blk_mask.append(cur_m & frame_ok[:, None])
            blk_cls.append(
                jnp.concatenate(
                    [dcls[h:], jnp.zeros((h, N0), dcls.dtype)], axis=0
                )
            )

        M1 = N0 * (2 * w + 1)
        g_boxes = jnp.concatenate(blk_boxes, axis=1)  # (T, M1, 4)
        g_scores = jnp.concatenate(blk_scores, axis=1)
        g_mask = jnp.concatenate(blk_mask, axis=1)
        g_cls = jnp.concatenate(blk_cls, axis=1)

        # ---- per-frame per-class NMS dedup (staged: video/frame_nms.py) ----
        # one-class-per-slot ⇒ all classes dedup in ONE grouped fixpoint
        g_valid = g_mask & (g_scores > 0)
        keep = nms_grouped(g_boxes, g_scores, g_valid, g_cls, cfg.nms_thresh)
        keep = keep & g_valid

        # ---- tracking (config 3; staged: video/track.py::track_from_det) ----
        # at track_stride s > 1 the scan only ever reads feats[::s], so
        # compute tracker features for the sampled frames ONLY (halves the
        # track/features block at s=2; outputs identical — track_batch's
        # feats_strided contract)
        s = int(cfg.track_stride)
        fr_src = frames[::s] if s > 1 else frames
        Tf = fr_src.shape[0]
        fb = cfg.feat_batch
        Tp = ((Tf + fb - 1) // fb) * fb
        fr_pad = jnp.concatenate(
            [fr_src, jnp.repeat(fr_src[-1:], Tp - Tf, axis=0)], axis=0
        )
        feats = jax.lax.map(
            lambda f: tracker_features(trk_model, trk_p, f),
            fr_pad.reshape(Tp // fb, fb, H, W, 3),
        )
        feats = feats.reshape((Tp,) + feats.shape[2:])[:Tf]

        cand_mask = keep & (g_scores >= cfg.anchor_thresh)
        tb, tc, ta, n_tracks = _greedy_track_rounds(
            trk_model, trk_cfg, cfg, feats, g_boxes, g_scores, cand_mask, frame_ok
        )

        # ---- output-budget truncation (staged: det_proto_to_arrays(64)) ----
        kept2, idx2 = _rank_mask(keep, cfg.out_budget)
        oboxes, oscores, ocls, omask = _compact_by_rank(
            idx2, cfg.out_budget, g_boxes, g_scores, g_cls, kept2
        )  # (T, Nb, ...)
        Nb = cfg.out_budget
        oscores_vec = jax.nn.one_hot(ocls, C, dtype=oscores.dtype) * oscores[..., None]
        oscores_vec = oscores_vec * omask[..., None]

        # ---- tubelet rescoring (config 4b; staged: video/rescore.py) ----
        new_scores, stats, matched_any = rescore_arrays(
            oboxes,
            oscores_vec,
            omask,
            tb,
            ta,
            cfg.rescore_match,
            cfg.bg_decay,
            top_ratio=cfg.top_ratio,
            boost=cfg.boost,
            min_matched_frac=cfg.min_matched_frac,
            stat_floor=float(cfg.stat_floor),
        )

        if cfg.tubelet_boxes:
            # ---- tubelet boxes as detections (staged: rescore.py) ----
            # live unmatched track boxes in INTERIOR gaps (matched frames on
            # both sides — see RescoreOptions.tubelet_boxes) append as det
            # slots scored by the tubelet statistic; the union is
            # rank-compacted back to the output budget in the same file
            # order the staged link stage's proto repack uses (dets first,
            # then tracks by index).
            has_before = jnp.cumsum(matched_any, axis=1) > 0
            has_after = jnp.flip(
                jnp.cumsum(jnp.flip(matched_any, axis=1), axis=1), axis=1
            ) > 0
            inj_valid = (
                ta
                & ~matched_any
                & has_before
                & has_after
                & (jnp.max(stats[:, 1:], axis=1) > 0)[:, None]
            )  # (K, T)
            inj_scores = stats[:, None, :] * inj_valid[..., None]  # (K,T,C)
            u_boxes = jnp.concatenate(
                [oboxes, jnp.swapaxes(tb, 0, 1)], axis=1
            )
            u_scores = jnp.concatenate(
                [new_scores, jnp.swapaxes(inj_scores, 0, 1)], axis=1
            )
            u_mask = jnp.concatenate([omask, inj_valid.T], axis=1)
            kept3, idx3 = _rank_mask(u_mask, Nb)
            oboxes, new_scores, omask = _compact_by_rank(
                idx3, Nb, u_boxes, u_scores, kept3
            )

        # ---- seq-NMS linking (config 5; staged: video/link.py) ----
        cls_scores = jnp.moveaxis(new_scores[:, :, 1:], 2, 0)  # (C-1, T, Nb)
        cls_mask = (cls_scores > 0) & omask[None]
        final_scores, path_ids = seq_nms_batch(
            oboxes,
            cls_scores,
            cls_mask,
            cfg.link_thresh,
            cfg.suppress_thresh,
            max_paths=cfg.max_paths,
            rescore=cfg.link_rescore,
        )
        return FusedOutput(
            oboxes, new_scores, omask, final_scores, path_ids,
            tb, tc, ta, n_tracks, stats,
        )

    return pipeline


def _greedy_track_rounds(
    trk_model, trk_cfg, cfg: FusedConfig, feats, cand_boxes, cand_scores,
    cand_mask, frame_ok,
):
    """Device greedy anchor selection + batched tracking (staged host loop).

    Exact semantics of ``track_from_det``: rounds of {pick up to A top-score
    uncovered candidates, skipping any that overlap (IoU > cover_thresh) a
    same-frame pick of this round; track all picks fwd+bwd in one batch; mark
    candidates covered by the new tracks} until ``max_tracks`` or everything
    is covered. Ties break (score desc, file-order index asc) — ``argmax``
    returns the first maximum, matching the host's stable sort.

    All state updates are self-gated (vmap lanes keep executing the body
    after their own convergence — see CLAUDE.md).
    """
    T, M = cand_scores.shape
    F = T * M
    A = cfg.anchors_per_round
    K = cfg.max_tracks
    # detection snapping uses the anchor-candidate det set — the SAME set
    # the staged path builds in track_from_det (post-MGP dedup'd dets with
    # score >= anchor_thresh); snap_to_dets is slot-permutation-invariant,
    # so the engines' different packings of this set snap identically.
    snap = (
        (cand_boxes, cand_scores, cand_mask) if cfg.snap_weight > 0.0 else None
    )
    b_flat = cand_boxes.reshape(F, 4)
    s_flat = cand_scores.reshape(F)
    m_flat = cand_mask.reshape(F)
    t_flat = jnp.arange(F, dtype=jnp.int32) // M
    slot_ar = jnp.arange(F)

    def round_body(state):
        covered, n, out_b, out_c, out_a, _ = state
        room = K - n
        avail0 = m_flat & ~covered

        def pick_step(carry, k):
            avail, picks, valids = carry
            s = jnp.where(avail, s_flat, -jnp.inf)
            i = jnp.argmax(s)
            ok = (s[i] > -jnp.inf) & (k < room)
            clash = (t_flat == t_flat[i]) & (
                pairwise_iou(b_flat[i][None], b_flat)[0] > cfg.cover_thresh
            )
            avail = jnp.where(ok, avail & ~clash & (slot_ar != i), avail)
            picks = picks.at[k].set(jnp.where(ok, i, 0))
            valids = valids.at[k].set(ok)
            return (avail, picks, valids), None

        (_, picks, valids), _ = jax.lax.scan(
            pick_step,
            (avail0, jnp.zeros(A, jnp.int32), jnp.zeros(A, bool)),
            jnp.arange(A),
        )
        anchor_ts = t_flat[picks]
        anchor_boxes = b_flat[picks]
        tb, tc, ta = track_batch(
            trk_model, trk_cfg, feats, anchor_ts, anchor_boxes, cfg.track_conf,
            snap=snap, snap_iou=cfg.snap_iou, snap_weight=cfg.snap_weight,
            frame_stride=cfg.track_stride,
            feats_strided=cfg.track_stride > 1,
            full_t=T if cfg.track_stride > 1 else None,
            # T may be bucket-padded (fused_runner); clamp the stride path's
            # anchor snap + interpolation to the last REAL frame so padded
            # and unpadded runs agree (track_batch valid_t contract)
            valid_t=(
                jnp.sum(frame_ok, dtype=jnp.int32)
                if cfg.track_stride > 1 else None
            ),
        )
        ta = ta & valids[:, None] & frame_ok[None, :]
        # K-slot scatter in pick order (invalid lanes land in the dummy row)
        slot = jnp.where(valids, n + jnp.cumsum(valids) - 1, K)
        out_b = out_b.at[slot].set(tb)
        out_c = out_c.at[slot].set(tc)
        out_a = out_a.at[slot].set(ta)
        # coverage: candidates overlapping a live track box at their frame
        iou_atm = jax.vmap(  # over lanes
            lambda boxes_k: jax.vmap(pairwise_iou)(boxes_k[:, None], cand_boxes)[
                :, 0
            ]
        )(tb)  # (A, T, M)
        cov = jnp.any(
            (iou_atm > cfg.cover_thresh) & ta[:, :, None], axis=0
        )  # (T, M)
        covered = covered | cov.reshape(F)
        covered = covered.at[picks].set(covered[picks] | valids)
        n = n + jnp.sum(valids, dtype=jnp.int32)
        return covered, n, out_b, out_c, out_a, jnp.any(valids)

    def cond(state):
        covered, n, *_ , progressed = state
        return (n < K) & jnp.any(m_flat & ~covered) & progressed

    state0 = (
        jnp.zeros(F, bool),
        jnp.int32(0),
        jnp.zeros((K + 1, T, 4), jnp.float32),
        jnp.zeros((K + 1, T), jnp.float32),
        jnp.zeros((K + 1, T), bool),
        jnp.asarray(True),
    )
    covered, n, out_b, out_c, out_a, _ = jax.lax.while_loop(
        cond, round_body, state0
    )
    return out_b[:K], out_c[:K], out_a[:K], n


def make_fused_pipeline(det_model, trk_model, trk_cfg, cfg: FusedConfig):
    """Returns jit(fn)(det_params, trk_params, frames_u8 (T,H,W,3), rois (T,R,4),
    t_valid=None, roi_mask=None) — t_valid masks padded tail frames (see
    pad_snippet); roi_mask masks padded proposal slots."""
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


def fused_to_protos(out: FusedOutput, frame_ids, video: str, class_names=None,
                    min_score: float = 0.0):
    """FusedOutput → (final det_proto, tubelets track_proto).

    Emission matches the staged seq-NMS stage (video/link.py::seq_nms_video):
    surviving slots carry the path statistic, tubelets are one track per
    (class, path id).
    """
    import numpy as np

    from vdetlib_tpu.protos.arrays import arrays_to_det_proto
    from vdetlib_tpu.video.link import tubelets_from_path_ids

    boxes = np.asarray(out.det_boxes)
    mask = np.asarray(out.det_mask)
    final = np.asarray(out.final_scores)  # (C-1, T, Nb)
    path_ids = np.asarray(out.path_ids)
    C = out.det_scores.shape[-1]
    T, Nb = mask.shape
    new_scores = np.zeros((T, Nb, C), np.float32)
    new_scores[:, :, 1:] = np.moveaxis(np.maximum(final, 0.0), 0, 2)
    det_proto = arrays_to_det_proto(
        boxes, new_scores, mask, frame_ids, video,
        class_names=class_names, score_thresh=min_score,
    )
    track_proto = tubelets_from_path_ids(
        boxes, final, path_ids, frame_ids, video, first_class=1
    )
    return det_proto, track_proto


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
