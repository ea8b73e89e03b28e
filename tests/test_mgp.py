"""MGP tests: flow box-shift accuracy, propagation fills detection gaps."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracle.mgp import gt_shift
from vdetlib_tpu.data.synth import (
    SynthConfig,
    det_proto_from_gt,
    make_video,
    vid_proto_in_memory,
)
from vdetlib_tpu.kernels.flow import flow_video, mean_flow_in_boxes, to_gray
from vdetlib_tpu.video.mgp import MGPOptions, mgp, propagate_dets
from vdetlib_tpu.protos.arrays import det_proto_to_arrays
from vdetlib_tpu.utils.common import iou


@pytest.fixture(scope="module")
def sv():
    return make_video(SynthConfig(num_frames=10, seed=5, max_speed=3.0))


@pytest.fixture(scope="module")
def flow(sv):
    return np.asarray(flow_video(jnp.asarray(sv.frames)))


def test_flow_shift_matches_gt_motion(sv, flow):
    """Mean flow inside a GT box ≈ the object's true motion (±1.5 px)."""
    K, T = sv.gt_boxes.shape[:2]
    errs = []
    for t in range(T - 1):
        shifts = np.asarray(
            mean_flow_in_boxes(
                jnp.asarray(flow[t]),
                jnp.asarray(sv.gt_boxes[:, t]),
                jnp.ones(K, bool),
            )
        )
        for k in range(K):
            want = gt_shift(sv.gt_boxes, k, t)
            errs.append(np.abs(shifts[k] - want))
    errs = np.asarray(errs)
    assert errs.mean() < 1.0, errs.mean()
    assert np.median(errs) < 0.8


def test_fastest_preset_box_shift(sv):
    """Quarter-res "fastest" preset: mean flow inside GT boxes still tracks
    the true motion (looser tolerance than full/half res — the field is 4×
    coarser but MGP only consumes the box MEAN)."""
    fq = flow_video(jnp.asarray(sv.frames), preset="fastest", upsample=False)
    fq = np.asarray(fq)
    assert fq.shape[1:3] == (sv.frames.shape[1] // 4, sv.frames.shape[2] // 4)
    K, T = sv.gt_boxes.shape[:2]
    errs = []
    for t in range(T - 1):
        shifts = np.asarray(
            mean_flow_in_boxes(
                jnp.asarray(fq[t]),
                jnp.asarray(sv.gt_boxes[:, t] * 0.25),
                jnp.ones(K, bool),
            )
        )
        for k in range(K):
            errs.append(np.abs(shifts[k] - gt_shift(sv.gt_boxes, k, t)))
    errs = np.asarray(errs)
    assert errs.mean() < 1.5, errs.mean()


def test_mgp_runs_with_fastest_preset(sv):
    """The MGP stage end-to-end on the quarter-res preset (coord plumbing)."""
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=1, distractors_per_frame=0)
    out = mgp(
        vid, det,
        opts=MGPOptions(
            num_classes=sv.config.num_classes, flow_preset="fastest",
            run_nms=False,
        ),
        frames_u8=sv.frames,
    )
    assert len(out["detections"]) > len(det["detections"])


def test_flow_static_background(sv, flow):
    """Flow in empty background regions is ≈ 0."""
    # bottom-right corner patch unlikely to contain an object every frame;
    # just assert global flow magnitude is dominated by object regions.
    mags = np.linalg.norm(flow, axis=-1)
    assert np.median(mags) < 1.0


def test_propagation_fills_gaps(sv):
    """Drop all dets at one frame; MGP refills them from the neighbors."""
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=1, distractors_per_frame=0)
    hole = 5
    det["detections"] = [d for d in det["detections"] if d["frame"] != hole]
    opts = MGPOptions(
        window=1, num_classes=sv.config.num_classes, max_boxes=16, run_nms=False
    )
    out = mgp(vid, det, opts=opts, frames_u8=sv.frames)
    filled = [d for d in out["detections"] if d["frame"] == hole]
    assert len(filled) >= sv.gt_boxes.shape[0]
    # refilled boxes sit near the GT at the hole frame
    K = sv.gt_boxes.shape[0]
    hits = 0
    for k in range(K):
        best = max(
            iou([d["bbox"]], sv.gt_boxes[k, hole - 1 : hole])[0, 0] for d in filled
        )
        hits += best > 0.5
    assert hits >= K - 1


def test_propagated_scores_decayed(sv):
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=1, distractors_per_frame=0)
    opts = MGPOptions(
        window=1,
        num_classes=sv.config.num_classes,
        max_boxes=16,
        score_decay=0.5,
        run_nms=False,
    )
    fids = [f["frame"] for f in vid["frames"]]
    boxes, scores, mask = det_proto_to_arrays(
        det, fids, opts.max_boxes, opts.num_classes
    )
    b2, s2, m2, hops = propagate_dets(sv.frames, boxes, scores, mask, opts)
    N = mask.shape[1]
    # hop +1 block: scores are source scores × 0.5
    blk = slice(N, 2 * N)
    src = scores[:-1]
    np.testing.assert_allclose(
        s2[1:, blk][m2[1:, blk]], (src * 0.5)[mask[:-1]], rtol=1e-5
    )
    # propagated boxes overlap their source (small motion)
    t = 3
    for n in range(N):
        if not m2[t + 1, N + n]:
            continue
        assert iou(b2[t + 1 : t + 2, N + n], boxes[t : t + 1, n])[0, 0] > 0.3


def test_mgp_with_nms_dedups(sv):
    vid = vid_proto_in_memory(sv)
    det = det_proto_from_gt(sv, dets_per_object=1, distractors_per_frame=0)
    o_nonms = MGPOptions(
        window=1, num_classes=sv.config.num_classes, max_boxes=16, run_nms=False
    )
    o_nms = MGPOptions(
        window=1, num_classes=sv.config.num_classes, max_boxes=16, run_nms=True
    )
    raw = mgp(vid, det, opts=o_nonms, frames_u8=sv.frames)
    ded = mgp(vid, det, opts=o_nms, frames_u8=sv.frames)
    assert len(ded["detections"]) < len(raw["detections"])
    assert len(ded["detections"]) >= len(det["detections"]) * 0.8


def test_pallas_flow_level_box_shift_parity(sv):
    """The Pallas flow level (TPU production path, interpret mode here) must
    produce the same MGP box shifts as the XLA level within a fraction of a
    pixel — mean-flow-in-box is the only consumer (SURVEY.md §3.3)."""
    import jax
    from vdetlib_tpu.kernels.flow import _avg_pool2, _flow_level
    from vdetlib_tpu.kernels.flow_pallas import flow_level_pallas

    gray_h = _avg_pool2(to_gray(jnp.asarray(sv.frames))).astype(jnp.bfloat16)
    i1, i2 = gray_h[:-1], gray_h[1:]
    ref = jax.vmap(lambda a, b: _flow_level(a, b, 5, 3, 0.08))(i1, i2)
    got = flow_level_pallas(i1, i2, search=5, radius=3, temperature=0.08,
                            interpret=True)
    T1 = ref.shape[0]
    boxes_h = jnp.asarray(sv.gt_boxes[:, :T1].transpose(1, 0, 2)) * 0.5
    valid = jnp.ones(boxes_h.shape[:2], bool)
    shifts_ref = jax.vmap(mean_flow_in_boxes)(ref, boxes_h, valid)
    shifts_got = jax.vmap(mean_flow_in_boxes)(got, boxes_h, valid)
    d = np.abs(np.asarray(shifts_ref) - np.asarray(shifts_got))
    assert d.mean() < 0.05 and d.max() < 0.5, (d.mean(), d.max())
