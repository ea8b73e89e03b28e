"""Side-by-side per-chunk differ: host-engine logic vs the fused step.

Replicates the host engine chunk body (verbatim logic from
video/stream.py::stream_video) next to make_stream_chunk_fn's step, and
prints the FIRST intermediate that diverges, per chunk.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.kernels.nms import batched_nms
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig, extract_template
from vdetlib_tpu.utils.common import iou as np_iou
from vdetlib_tpu.video.detect import _detect_step
from vdetlib_tpu.video.stream import (
    StreamOptions,
    _mgp_chunk,
    backtrack_seeds,
    make_stream_chunk_fn,
    track_chunk,
)
from vdetlib_tpu.video.track import init_tracker, tracker_features

HW = (96, 128)
C = 4
R = 16
T = 36

det_cfg = detector_preset("tiny", num_classes=C)
det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
trk_cfg = TrackerConfig()
trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)

sv = make_video(SynthConfig(num_frames=T, height=HW[0], width=HW[1], num_classes=C, seed=85, max_speed=2.0))
rng = np.random.default_rng(85)
rois_all = np.zeros((T, R, 4), np.float32)
K = sv.gt_boxes.shape[0]
for t in range(T):
    n = 0
    for k in range(K):
        for _ in range(3):
            rois_all[t, n] = np.clip(
                sv.gt_boxes[k, t] + rng.normal(0, 2, 4),
                0, [HW[1] - 1, HW[0] - 1, HW[1] - 1, HW[0] - 1],
            )
            n += 1
    while n < R:
        x1, y1 = rng.uniform(0, HW[1] - 20), rng.uniform(0, HW[0] - 20)
        rois_all[t, n] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
        n += 1

opts = StreamOptions(
    engine="fused", chunk=8, max_rois=R, num_classes=C, track_slots=6,
    seed_thresh=0.2, conf_thresh=0.3, max_paths=20,
)
A = opts.track_slots
P, Cf = trk_cfg.template_pool, trk_cfg.out_features

step, unpack = make_stream_chunk_fn(det_model, trk_model, trk_cfg, opts)


def diff(name, a, b, chunk_i, atol=0.0):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    if d.max() > atol:
        print(f"chunk {chunk_i}: {name} DIVERGES maxdiff={d.max():.3e} frac={(d>0).mean():.3f}")
        return True
    return False


# ---- host state ----
slot_templates = jnp.zeros((A, P, P, Cf), jnp.float32)
slot_boxes = jnp.zeros((A, 4), jnp.float32)
slot_alive = jnp.zeros((A,), bool)
prev_feats = None
prev_last_frame = None
prev_rois = np.zeros((R, 4), np.float32)
prev_cls_scores = np.zeros((C - 1, R), np.float32)
prev_keep = np.zeros((C - 1, R), bool)

# ---- fused state ----
carry = None
halo = None

t_global = 0
for s0 in range(0, T, opts.chunk):
    chunk = sv.frames[s0 : s0 + opts.chunk]
    Tc = chunk.shape[0]
    pad = opts.chunk - Tc
    if pad:
        chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], axis=0)
    rois = np.zeros((opts.chunk, R, 4), np.float32)
    avail = rois_all[t_global : t_global + Tc]
    rois[: len(avail)] = avail
    frames_j = jnp.asarray(chunk)
    rois_j = jnp.asarray(rois)
    ci = s0 // opts.chunk

    # ======== fused step ========
    if carry is None:
        feat_s = jax.eval_shape(lambda f: tracker_features(trk_model, trk_params, f), frames_j)
        carry = (
            jnp.zeros((A, P, P, Cf), jnp.float32),
            jnp.zeros((A, 4), jnp.float32),
            jnp.zeros((A,), bool),
            jnp.zeros((R, 4), jnp.float32),
            jnp.zeros((C - 1, R), jnp.float32),
            jnp.zeros((C - 1, R), bool),
            jnp.zeros(feat_s.shape, feat_s.dtype),
            jnp.asarray(False),
        )
        halo = frames_j[0]
    carry, halo, packed = step(
        det_params, trk_params, frames_j, rois_j, jnp.int32(Tc), halo, carry
    )
    out = unpack(np.asarray(packed))

    # ======== host chunk (verbatim logic) ========
    probs, boxes = _detect_step(det_model, det_params, frames_j, rois_j, True)
    cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2)
    cls_boxes = jnp.swapaxes(boxes[:, :, 1:, :], 1, 2)
    keep = batched_nms(cls_boxes, cls_scores, cls_scores > 0.01, opts.nms_thresh)
    halo_h = chunk[:1] if prev_last_frame is None else prev_last_frame[None]
    frames_ext = jnp.asarray(np.concatenate([halo_h, chunk], axis=0))
    m_boxes, m_scores, m_valid = _mgp_chunk(
        frames_ext, rois_j, cls_scores, keep,
        jnp.asarray(prev_rois), jnp.asarray(prev_cls_scores),
        jnp.asarray(prev_keep), opts.mgp_decay, preset=opts.flow_preset,
    )
    m_keep = batched_nms(
        jnp.broadcast_to(m_boxes[:, None], (opts.chunk, C - 1) + m_boxes.shape[1:]),
        m_scores, m_valid & (m_scores > 0), opts.nms_thresh,
    )
    out_boxes, out_scores, out_keep = m_boxes, m_scores, m_keep
    prev_rois = rois[Tc - 1]
    prev_cls_scores = np.asarray(cls_scores)[Tc - 1]
    prev_keep = np.asarray(keep)[Tc - 1]
    prev_last_frame = chunk[Tc - 1]

    feats = tracker_features(trk_model, trk_params, frames_j)
    tb, tc_, ta, box_end, alive_end = track_chunk(
        trk_cfg, feats, slot_templates, slot_boxes, slot_alive, opts.conf_thresh
    )
    slot_boxes, slot_alive = box_end, alive_end
    tb_np, ta_np = np.asarray(tb), np.asarray(ta)

    # compare stage 1: det/mgp/track outputs
    stop = False
    stop |= diff("out_boxes", out["out_boxes"], out_boxes, ci)
    stop |= diff("out_keep", out["out_keep"], np.asarray(out_keep).astype(np.float32), ci)
    stop |= diff("feats_carry(prev_feats slot)", np.asarray(carry[6]), np.asarray(feats), ci)
    stop |= diff("tb", out["tb"], tb, ci)
    stop |= diff("ta", out["ta"], np.asarray(ta).astype(np.float32), ci)
    stop |= diff("box_end(pre-seed)", None if stop else np.zeros(1), np.zeros(1), ci)  # placeholder

    # host seeding
    scores_np = np.asarray(out_scores)
    keep_np = np.asarray(out_keep)
    boxes_np = np.asarray(out_boxes)
    N = boxes_np.shape[1]
    best_scores = np.where(
        np.moveaxis(keep_np, 1, 2), np.moveaxis(scores_np, 1, 2), 0.0
    ).max(axis=2)
    flat = np.argsort(-best_scores.ravel(), kind="stable")
    free = [a for a in range(A) if not bool(np.asarray(slot_alive)[a])]
    seeded = []
    seed_lanes = []
    host_seed_records = []
    for fi in flat:
        if not free:
            break
        ti, ri = divmod(int(fi), N)
        if best_scores[ti, ri] < opts.seed_thresh:
            break
        if ti >= Tc:
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
        seed_lanes.append((a, ti, cand.copy()))
        host_seed_records.append((a, ti, cand.copy(), best_scores[ti, ri]))
        seeded.append((ti, ri))

    if seed_lanes:
        from vdetlib_tpu.video.stream import _extract_templates_batch
        ti_arr = np.zeros(A, np.int32)
        bx_arr = np.zeros((A, 4), np.float32)
        for k, (a, ti, cand) in enumerate(seed_lanes):
            ti_arr[k] = ti
            bx_arr[k] = cand
        tmpl = _extract_templates_batch(
            feats, jnp.asarray(ti_arr), jnp.asarray(bx_arr), trk_cfg
        )
        for k, (a, ti, cand) in enumerate(seed_lanes):
            slot_templates = slot_templates.at[a].set(tmpl[k])

    # compare seeds
    fused_seeds = [
        (int(out["seed_slot"][k]), int(out["seed_ti"][k]), out["seed_box"][k], out["seed_score"][k])
        for k in range(A) if out["seed_ok"][k] > 0.5
    ]
    if len(fused_seeds) != len(host_seed_records):
        print(f"chunk {ci}: SEED COUNT differs fused={len(fused_seeds)} host={len(host_seed_records)}")
        stop = True
    else:
        for (fa, fti, fbox, fsc), (ha, hti, hbox, hsc) in zip(fused_seeds, host_seed_records):
            if fa != ha or fti != hti or np.abs(fbox - hbox).max() > 0 or abs(fsc - hsc) > 0:
                print(f"chunk {ci}: SEED differs fused=({fa},{fti},{fbox},{fsc}) host=({ha},{hti},{hbox},{hsc})")
                stop = True

    # compare carried templates/boxes/alive after seeding
    tdiv = diff("carry templates", np.asarray(carry[0]), np.asarray(slot_templates), ci)
    if tdiv:
        ct = np.asarray(carry[0])
        ht = np.asarray(slot_templates)
        d = np.abs(ct.astype(np.float64) - ht.astype(np.float64))
        lanes = np.where(d.reshape(A, -1).max(axis=1) > 0)[0]
        print("  differing lanes:", lanes, "per-lane maxdiff:",
              d.reshape(A, -1).max(axis=1))
        # standalone jit-vmap extraction on the HOST inputs
        import functools
        from vdetlib_tpu.nn.tracker_net import extract_template as _et

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def batch_extract(f_all, tis_, boxes_, cfg):
            sel = f_all[tis_]
            return jax.vmap(lambda f, b: _et(f, b, cfg))(sel, boxes_)

        h_ti = np.array([r[1] for r in host_seed_records], np.int32)
        h_bx = np.stack([r[2] for r in host_seed_records])
        h_lane = np.array([r[0] for r in host_seed_records])
        sb = np.asarray(batch_extract(feats, jnp.asarray(h_ti), jnp.asarray(h_bx), trk_cfg))
        # reorder into lane positions
        sb_l = np.zeros_like(ht)
        for i, a in enumerate(h_lane):
            sb_l[a] = sb[i]
        print("  standalone-vmap vs host-eager maxdiff:",
              np.abs(sb_l - ht).max())
        print("  standalone-vmap vs fused maxdiff:",
              np.abs(sb_l - ct).max())
    stop |= tdiv
    stop |= diff("carry boxes", np.asarray(carry[1]), np.asarray(slot_boxes), ci)
    stop |= diff("carry alive", np.asarray(carry[2]).astype(np.float32), np.asarray(slot_alive).astype(np.float32), ci)

    # host backtracking
    if opts.backtrack and seed_lanes:
        Tw = opts.chunk
        window = (
            jnp.concatenate([prev_feats, feats], axis=0)
            if prev_feats is not None
            else jnp.concatenate([jnp.zeros_like(feats), feats], axis=0)
        )
        anchor_ts = np.zeros(A, np.int32)
        anchor_boxes = np.zeros((A, 4), np.float32)
        lane_on = np.zeros(A, bool)
        for a, ti, box in seed_lanes:
            anchor_ts[a] = Tw + ti
            anchor_boxes[a] = box
            lane_on[a] = True
        bb, balive = backtrack_seeds(
            trk_cfg, window, jnp.asarray(anchor_ts), jnp.asarray(anchor_boxes),
            slot_templates, jnp.asarray(lane_on), opts.conf_thresh,
        )
        stop |= diff("bb (backtrack boxes, live only)",
                     out["bb"] * (out["balive"][:, :, None] > 0.5),
                     np.asarray(bb) * np.asarray(balive)[:, :, None], ci)
        stop |= diff("balive", out["balive"], np.asarray(balive).astype(np.float32), ci)

    prev_feats = feats
    t_global += Tc
    print(f"chunk {ci}: done (host seeds={len(host_seed_records)})")
    if stop:
        print("STOPPING at first divergence")
        break
