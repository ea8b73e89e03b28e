"""Analytic FLOPs model of the fused pipeline — MFU/roofline accounting.

VERDICT r3 item 5: put a utilization number next to the fps headline.
Counts 2·MAC for every conv/matmul (the MXU work) and arithmetic-op counts
for the VPU-bound stages (flow cost volume, NMS fixpoint, seq-NMS DP, IoU
tensors). Elementwise glue (GroupNorm, relu, softmax, warps, pads) is
deliberately EXCLUDED from the analytic model — it is HBM-bound, not
FLOP-bound; ``scripts/mfu_report.py`` cross-checks each component (and the
whole fused dispatch) against XLA's ``compiled.cost_analysis()`` so the
excluded fraction is measured, not guessed.

MFU convention: model FLOPs ÷ (wall time × chip peak), peak = bf16 matmul
peak regardless of the op's actual dtype/unit (the standard MFU definition —
it deliberately punishes f32/VPU work). TPU v5e (this chip, "v5 lite"):
197 TFLOP/s bf16, 819 GB/s HBM.

Shapes mirror ``pipeline/fused.py``/``bench.py``; every function takes the
same config objects those use, so a preset change reprices automatically.
"""

from __future__ import annotations

from dataclasses import dataclass

# TPU v5e ("v5 lite") datasheet numbers.
PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9


def conv2d(h_out: int, w_out: int, kh: int, kw: int, cin: int, cout: int) -> float:
    return 2.0 * h_out * w_out * kh * kw * cin * cout


def dense(n: int, d_in: int, d_out: int) -> float:
    return 2.0 * n * d_in * d_out


@dataclass(frozen=True)
class ComponentFlops:
    """FLOPs for one pipeline component at one dispatch's shapes."""

    name: str
    flops: float
    unit: str  # "MXU" (matmul/conv) | "VPU" (elementwise/reduce)
    note: str = ""


def backbone_flops(cfg, h: int, w: int) -> float:
    """Per-image conv FLOPs of nn/backbone.py::Backbone (2·MAC)."""
    total = 0.0
    # stem: 7x7 stride 2
    h2, w2 = h // 2, w // 2
    total += conv2d(h2, w2, 7, 7, 3, cfg.stem_features)
    # maxpool stride 2 (no MACs)
    hs, ws = h2 // 2, w2 // 2
    cin = cfg.stem_features
    for si, (n_blocks, feats) in enumerate(zip(cfg.stage_sizes, cfg.stage_features)):
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            hs, ws = hs // stride, ws // stride
            total += conv2d(hs, ws, 3, 3, cin, feats)  # conv1 (strided)
            total += conv2d(hs, ws, 3, 3, feats, feats)  # conv2
            if cin != feats or stride != 1:  # 1x1 projection
                total += conv2d(hs, ws, 1, 1, cin, feats)
            cin = feats
    return total


def roi_align_flops(h_f: int, w_f: int, c: int, pool: int, n_rois: int) -> float:
    """Separable-matmul ROI align (nn/heads.py::roi_align, fused=False)."""
    per_roi = 2.0 * pool * h_f * w_f * c + 2.0 * pool * pool * w_f * c
    return n_rois * per_roi


def rcnn_head_flops(pool: int, c: int, hidden: int, num_classes: int, n_rois: int) -> float:
    d_in = pool * pool * c
    per_roi = (
        2.0 * d_in * hidden
        + 2.0 * hidden * hidden
        + 2.0 * hidden * num_classes
        + 2.0 * hidden * num_classes * 4
    )
    return n_rois * per_roi


def tracker_feat_flops(trk_cfg, h: int, w: int) -> float:
    """Per-frame conv FLOPs of nn/tracker_net.py::TrackerNet."""
    total = 0.0
    cin = 3
    hs, ws = h, w
    for i, feats in enumerate(trk_cfg.features):
        stride = 2 if i < 2 else 1
        hs, ws = hs // stride, ws // stride
        total += conv2d(hs, ws, 3, 3, cin, feats)
        cin = feats
    total += conv2d(hs, ws, 1, 1, cin, trk_cfg.out_features)
    return total


def tracker_scan_flops(trk_cfg, h: int, w: int, t: int, anchors: int) -> float:
    """Folded fwd+bwd NCC scan (video/track.py::track_batch): 2A lanes × T
    steps × num_scales; per lane-step: search-window ROI align (pool Q over
    the stride-4 feature map) + NCC correlation (resp + local-norm convs)."""
    hf, wf = h // trk_cfg.stride, w // trk_cfg.stride
    c = trk_cfg.out_features
    P, Q = trk_cfg.template_pool, trk_cfg.search_pool
    align = roi_align_flops(hf, wf, c, Q, 1)
    r = Q - P + 1  # response side
    corr = 2.0 * r * r * P * P * c * 2  # resp conv + squared-norm conv
    lanes = 2 * anchors * max(1, trk_cfg.num_scales)
    template = roi_align_flops(hf, wf, c, P, 2 * anchors)  # once per lane
    return lanes * t * (align + corr) + template


def flow_flops(h: int, w: int, n_pairs: int, preset: str = "fastest",
               search: int = 5, radius: int = 3) -> float:
    """Block-matching flow (kernels/flow.py / flow_pallas.py), fast presets:
    single level at h/pool × w/pool, S² shift candidates; per pixel per
    candidate: diff+square (2), separable box sum (2·(2r+1)+1), online
    soft-argmin (~14: 2 exp≈2, min, 3 FMA pairs, compares)."""
    pool = {"accurate": 1, "fast": 2, "fastest": 4}[preset]
    hp, wp = h // pool, w // pool
    s2 = (2 * search + 1) ** 2
    per_px_cand = 2 + (2 * (2 * radius + 1) + 1) + 14
    return float(n_pairs) * hp * wp * s2 * per_px_cand


def iou_matrix_flops(n: int, m: int) -> float:
    """Pairwise IoU (geometry/boxes.py): ~12 arithmetic ops per pair."""
    return 12.0 * n * m


def nms_grouped_flops(t: int, group: int, iters: int = 8) -> float:
    """Grouped NMS fixpoint (kernels/nms*.py): adjacency IoU once + ~iters
    fixpoint sweeps of mask/compare work over the G×G adjacency."""
    return t * (iou_matrix_flops(group, group) + iters * 3.0 * group * group)


def seq_nms_flops(t: int, n: int, classes: int, max_paths: int) -> float:
    """Seq-NMS DP (kernels/seq_nms.py): per class, per path round: forward DP
    over (T-1)·N² edges (~4 ops) + per-frame suppression (~3·N² per frame);
    adjacency IoU built once per class."""
    adj = (t - 1) * iou_matrix_flops(n, n)
    per_round = (t - 1) * 4.0 * n * n + t * 3.0 * n
    return classes * (adj + max_paths * per_round)


def rescore_flops(t: int, k: int, n: int, c: int) -> float:
    """rescore_arrays: (T,K,N) IoU + masked max over dets per class + sort."""
    return t * k * iou_matrix_flops(1, n) + 2.0 * t * k * n * c


def fused_dispatch_flops(det_cfg, trk_cfg, fused_cfg, t: int, n_rois: int,
                         videos: int = 1) -> list[ComponentFlops]:
    """Per-component FLOPs of ONE fused-pipeline dispatch (bench.py::run).

    Args mirror bench.py: detector/tracker configs, FusedConfig, frames per
    video T, proposals per frame R, videos per dispatch V.
    """
    h, w = fused_cfg.image_hw
    c = det_cfg.num_classes
    bb = det_cfg.backbone
    hf, wf = h // 16, w // 16
    cf = bb.stage_features[-1]
    comps = [
        ComponentFlops(
            "detect/backbone", t * backbone_flops(bb, h, w), "MXU",
            f"{t} frames @ {h}x{w}, stride-16 resnet",
        ),
        ComponentFlops(
            "detect/roi_align", t * roi_align_flops(hf, wf, cf, det_cfg.roi_pool, n_rois),
            "MXU", f"{n_rois} rois/frame, separable bilinear matmuls",
        ),
        ComponentFlops(
            "detect/head", t * rcnn_head_flops(det_cfg.roi_pool, cf, det_cfg.head_hidden, c, n_rois),
            "MXU", f"2x dense({det_cfg.head_hidden}) + cls/bbox",
        ),
        ComponentFlops(
            "track/features",
            -(-t // fused_cfg.track_stride) * tracker_feat_flops(trk_cfg, h, w),
            "MXU",
            f"dense tracker conv features, every {fused_cfg.track_stride}-th "
            "frame" if fused_cfg.track_stride > 1
            else "dense tracker conv features, all frames",
        ),
        ComponentFlops(
            "track/ncc_scan",
            tracker_scan_flops(
                trk_cfg, h, w, -(-t // fused_cfg.track_stride),
                fused_cfg.anchors_per_round,
            ),
            "MXU",
            f"{2 * fused_cfg.anchors_per_round} lanes x "
            f"{-(-t // fused_cfg.track_stride)} steps",
        ),
        ComponentFlops(
            "mgp/flow", flow_flops(h, w, 2 * (t - 1), preset=fused_cfg.flow_preset),
            "VPU", f"preset={fused_cfg.flow_preset}, fwd+bwd pairs",
        ),
        ComponentFlops(
            "mgp/nms_grouped",
            nms_grouped_flops(t, fused_cfg.det_budget * (2 * fused_cfg.mgp_window + 1)),
            "VPU", "post-MGP per-frame per-class dedup",
        ),
        ComponentFlops(
            "rescore", rescore_flops(t, fused_cfg.max_tracks, fused_cfg.out_budget, c),
            "VPU", "",
        ),
        ComponentFlops(
            "seq_nms", seq_nms_flops(t, fused_cfg.out_budget, c - 1, fused_cfg.max_paths),
            "VPU", f"{c - 1} classes x {fused_cfg.max_paths} paths",
        ),
    ]
    if videos != 1:
        comps = [ComponentFlops(x.name, x.flops * videos, x.unit, x.note) for x in comps]
    return comps


def total_flops(comps: list[ComponentFlops]) -> float:
    return sum(x.flops for x in comps)


def mfu(flops: float, seconds: float, peak: float = PEAK_BF16_FLOPS) -> float:
    return flops / (seconds * peak)
