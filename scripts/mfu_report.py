#!/usr/bin/env python
"""MFU / roofline report for the fused pipeline (VERDICT r3 item 5).

Three parts:
1. CROSS-CHECK: compile each big component at the bench shape on CPU and
   compare XLA's ``compiled.cost_analysis()['flops']`` against the analytic
   model in utils/flops.py (the analytic model counts conv/matmul MACs and
   the VPU stages' arithmetic; GN/relu/glue are excluded by design — the
   delta column measures that exclusion).
2. UTILIZATION TABLE: analytic FLOPs ÷ measured chain-differenced marginal
   ms (bench_components.py methodology; values passed via --ms_json or the
   round-3/4 defaults below) → achieved TFLOP/s and % of bf16 peak per
   component.
3. HEADLINE MFU: total dispatch FLOPs ÷ (dispatch seconds × 197 TFLOP/s).

CPU-runnable (compile-only; keeps the chip free):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        python scripts/mfu_report.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.pipeline.fused import FusedConfig
from vdetlib_tpu.utils import flops as F
from vdetlib_tpu.video.track import init_tracker

# bench.py constants
T, H, W, R, C, B, A, V = 256, 240, 320, 64, 31, 32, 8, 4

# Marginal ms per component at the bench shape, chain-differenced on the
# real chip (RESULTS.md round-3 profile at the quarter-res flow default;
# per 256-frame video at V=4). Re-measure with bench_components.py when the
# program changes and pass --ms_json.
DEFAULT_MS = {
    "detect/backbone": 31.2,
    "detect/roi_align": 6.4,
    "detect/head": 10.6,
    "track/features": 12.0,
    "track/ncc_scan": 19.8,
    "mgp/flow": 3.0,
    "mgp/nms_grouped": 0.7,
    "rescore": 1.0,   # part of the ~5-6 ms glue block
    "seq_nms": 9.8,
}


def _flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", float("nan")))


def cross_check(det_model, det_params, trk_model, trk_params, det_cfg, trk_cfg):
    from vdetlib_tpu.kernels.flow import _flow_level
    from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
    from vdetlib_tpu.video.detect import _detect_step
    from vdetlib_tpu.video.rescore import rescore_arrays
    from vdetlib_tpu.video.track import track_batch, tracker_features

    # Loop-free programs must match XLA closely (ana/xla ≈ 1); programs built
    # on lax.scan / lax.while_loop report "loop" — XLA's cost_analysis counts
    # the loop BODY once, not ×trip-count, so ana ≫ xla is the expected and
    # correct reading there (e.g. track_batch ≈ ×T, seq-NMS ≈ ×(paths·rounds)).
    rows = []
    bb = det_cfg.backbone
    hf, wf, cf = H // 16, W // 16, bb.stage_features[-1]

    # detection step at B frames; analytic scaled to the same B
    frames = jnp.zeros((B, H, W, 3), jnp.uint8)
    rois = jnp.zeros((B, R, 4), jnp.float32)
    xla = _flops_of(lambda f, r: _detect_step(det_model, det_params, f, r, True), frames, rois)
    ana = B * (
        F.backbone_flops(bb, H, W)
        + F.roi_align_flops(hf, wf, cf, det_cfg.roi_pool, R)
        + F.rcnn_head_flops(det_cfg.roi_pool, cf, det_cfg.head_hidden, C, R)
    )
    rows.append(("detect_step(B=32)", ana, xla, "flat"))

    xla = _flops_of(lambda f: tracker_features(trk_model, trk_params, f), frames)
    rows.append(("tracker_features(32f)", B * F.tracker_feat_flops(trk_cfg, H, W), xla, "flat"))

    # one flow level pair at quarter res (XLA form; the Pallas kernel runs
    # the same shift set)
    g = jnp.zeros((H // 4, W // 4), jnp.bfloat16)
    xla = _flops_of(lambda a, b: _flow_level(a, b, 5, 3, 0.08), g, g)
    rows.append(("flow_level(1 pair)", F.flow_flops(H, W, 1, "fastest"), xla, "flat"))

    # tracker scan at T=16 steps, A anchors
    t16 = 16
    feats = jnp.zeros((t16, H // trk_cfg.stride, W // trk_cfg.stride, trk_cfg.out_features), jnp.bfloat16)
    a_ts = jnp.zeros((A,), jnp.int32)
    a_bx = jnp.tile(jnp.asarray([10.0, 10.0, 60.0, 60.0]), (A, 1))
    xla = _flops_of(
        lambda f, ts, bx: track_batch(trk_model, trk_cfg, f, ts, bx, 0.5), feats, a_ts, a_bx
    )
    rows.append(("track_batch(T=16)", F.tracker_scan_flops(trk_cfg, H, W, t16, A), xla, "loop"))

    # rescore at the bench shape
    db = jnp.zeros((T, 64, 4)); ds = jnp.zeros((T, 64, C)); dm = jnp.ones((T, 64), bool)
    tb = jnp.zeros((A, T, 4)); tm = jnp.ones((A, T), bool)
    xla = _flops_of(
        lambda a, b, c, d, e: rescore_arrays(a, b, c, d, e, 0.5, 1.0), db, ds, dm, tb, tm
    )
    rows.append(("rescore(bench)", F.rescore_flops(T, A, 64, C), xla, "flat"))

    # seq-NMS at T=64 (while-loop trip counts are data-dependent; XLA's
    # static count is a lower bound — noted, not asserted)
    t64 = 64
    bx = jnp.zeros((t64, 64, 4)); sc = jnp.zeros((C - 1, t64, 64)); mk = jnp.ones((C - 1, t64, 64), bool)
    try:
        xla = _flops_of(
            lambda b_, s_, m_: seq_nms_batch(b_, s_, m_, 0.5, 0.3, 32), bx, sc, mk
        )
    except Exception:
        xla = float("nan")
    rows.append(("seq_nms(T=64)", F.seq_nms_flops(t64, 64, C - 1, 32), xla, "loop"))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms_json", default=None, help="{'component': marginal_ms} override")
    ap.add_argument("--dispatch_ms", type=float, default=118.0,
                    help="measured per-video dispatch ms at V=4 (RESULTS.md)")
    ap.add_argument("--skip_cross_check", action="store_true")
    args = ap.parse_args()

    det_cfg = detector_preset("base", num_classes=C)
    trk_cfg = TrackerConfig()
    fused_cfg = FusedConfig(image_hw=(H, W), detect_batch=B, feat_batch=B,
                            anchors_per_round=A, max_tracks=A, max_paths=32)

    comps = F.fused_dispatch_flops(det_cfg, trk_cfg, fused_cfg, T, R, videos=1)
    total = F.total_flops(comps)
    ms_map = dict(DEFAULT_MS)
    if args.ms_json:
        ms_map.update(json.loads(open(args.ms_json).read()))

    print(f"backend: {jax.default_backend()}\n")
    print("== per-component utilization (one 256-frame video) ==")
    print(f"{'component':22s} {'GFLOP':>9s} {'unit':>4s} {'ms':>7s} {'TFLOP/s':>8s} {'% bf16 peak':>11s}")
    sum_ms = 0.0
    for cmp_ in comps:
        ms = ms_map.get(cmp_.name)
        sum_ms += ms or 0.0
        tfs = cmp_.flops / (ms * 1e-3) / 1e12 if ms else float("nan")
        pct = 100.0 * tfs * 1e12 / F.PEAK_BF16_FLOPS
        print(f"{cmp_.name:22s} {cmp_.flops / 1e9:9.2f} {cmp_.unit:>4s} "
              f"{ms if ms else float('nan'):7.2f} {tfs:8.2f} {pct:11.2f}")
    print(f"{'TOTAL':22s} {total / 1e9:9.2f} {'':4s} {sum_ms:7.2f}")

    disp_s = args.dispatch_ms * 1e-3
    mfu = F.mfu(total, disp_s)
    fps = T / disp_s
    print(f"\n== headline ==")
    print(f"dispatch: {total / 1e9:.1f} GFLOP/video, {args.dispatch_ms:.1f} ms/video "
          f"(V={V} amortized) -> {fps:.0f} fps/chip")
    print(f"MFU = {100 * mfu:.2f}% of {F.PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s bf16 peak")
    mxu = sum(x.flops for x in comps if x.unit == "MXU")
    print(f"MXU-op share of FLOPs: {100 * mxu / total:.1f}%")

    if not args.skip_cross_check:
        print("\n== analytic vs XLA cost_analysis (CPU compile) ==")
        rows = cross_check(*init_detector(det_cfg, (H, W), R, seed=0),
                           *init_tracker(trk_cfg, image_hw=(H, W), seed=0),
                           det_cfg=det_cfg, trk_cfg=trk_cfg)
        print(f"{'program':24s} {'analytic GF':>12s} {'XLA GF':>10s} {'ana/xla':>8s}  note")
        for name, ana, xla, kind in rows:
            ratio = ana / xla if xla == xla and xla else float("nan")
            note = ("" if kind == "flat" else
                    "loop body counted once by XLA; ana/xla ~ trip count")
            print(f"{name:24s} {ana / 1e9:12.2f} {xla / 1e9:10.2f} {ratio:8.3f}  {note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
