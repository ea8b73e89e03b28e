"""Lock the analytic FLOPs model (utils/flops.py) against XLA cost_analysis.

The MFU headline printed by bench.py divides the analytic model's FLOPs by
measured wall time; if the model drifts from the real program (an arch change
nobody repriced), the MFU number silently lies. These tests compile the two
loop-free compute programs at test size and assert the analytic count stays
within ±15% of XLA's own cost_analysis (the slack is the deliberately-excluded
HBM-bound glue: GroupNorm, relu, resize — see utils/flops.py docstring).
Loop-carried programs (track scan, seq-NMS) can't be locked this way: XLA
counts a while/scan body once, not ×trip-count (scripts/mfu_report.py
documents the expected ana/xla ≈ trip-count reading there).
"""

import jax
import jax.numpy as jnp
import pytest

from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.utils import flops as F


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def test_detect_step_flops_match_xla():
    from vdetlib_tpu.video.detect import _detect_step

    h, w, b, r, c = 120, 160, 2, 8, 6
    cfg = detector_preset("tiny", num_classes=c)
    model, params = init_detector(cfg, (h, w), max_rois=r, seed=0)
    frames = jnp.zeros((b, h, w, 3), jnp.uint8)
    rois = jnp.tile(jnp.asarray([4.0, 4.0, 60.0, 60.0]), (b, r, 1))
    xla = _xla_flops(lambda f, rr: _detect_step(model, params, f, rr, True), frames, rois)

    bb = cfg.backbone
    hf, wf, cf = h // 16, w // 16, bb.stage_features[-1]
    ana = b * (
        F.backbone_flops(bb, h, w)
        + F.roi_align_flops(hf, wf, cf, cfg.roi_pool, r)
        + F.rcnn_head_flops(cfg.roi_pool, cf, cfg.head_hidden, c, r)
    )
    assert ana == pytest.approx(xla, rel=0.15), (ana, xla, ana / xla)


def test_tracker_features_flops_match_xla():
    from vdetlib_tpu.video.track import init_tracker, tracker_features

    h, w, b = 120, 160, 2
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=(h, w), seed=0)
    frames = jnp.zeros((b, h, w, 3), jnp.uint8)
    xla = _xla_flops(lambda f: tracker_features(model, params, f), frames)
    ana = b * F.tracker_feat_flops(cfg, h, w)
    assert ana == pytest.approx(xla, rel=0.15), (ana, xla, ana / xla)


def test_dispatch_flops_scale_and_split():
    from vdetlib_tpu.pipeline.fused import FusedConfig

    det_cfg = detector_preset("base", num_classes=31)
    trk_cfg = TrackerConfig()
    fused_cfg = FusedConfig(image_hw=(240, 320), detect_batch=32, feat_batch=32,
                            anchors_per_round=8, max_tracks=8, max_paths=32)
    one = F.fused_dispatch_flops(det_cfg, trk_cfg, fused_cfg, 256, 64, videos=1)
    four = F.fused_dispatch_flops(det_cfg, trk_cfg, fused_cfg, 256, 64, videos=4)
    assert F.total_flops(four) == pytest.approx(4 * F.total_flops(one))
    assert all(x.flops > 0 for x in one)
    # the pipeline is MXU-dominated by design — the MFU convention is sound
    mxu = sum(x.flops for x in one if x.unit == "MXU")
    assert mxu / F.total_flops(one) > 0.95
