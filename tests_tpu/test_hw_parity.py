"""hw-vs-interpret parity for every Pallas kernel, on the real chip.

Interpret mode is the semantic reference (tests/ already proves it equals
the numpy oracles / XLA paths on CPU); these tests prove the MOSAIC LOWERING
matches interpret mode on hardware, per kernel, per production shape family.
Motivation: a (N=1, K=8) matmul once MISCOMPILED silently on hardware while
interpret mode was right (CLAUDE.md "Mosaic lowering rules").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest


def _boxes(rng, n, hw=(240, 320)):
    h, w = hw
    x1 = rng.uniform(0, w - 8, n)
    y1 = rng.uniform(0, h - 8, n)
    bw = rng.uniform(4, 120, n)
    bh = rng.uniform(4, 120, n)
    return np.stack(
        [x1, y1, np.minimum(x1 + bw, w), np.minimum(y1 + bh, h)], axis=1
    ).astype(np.float32)


@pytest.mark.parametrize("b,n", [(4, 8), (16, 48), (64, 128)])
def test_nms_fixpoint_hw(b, n):
    from vdetlib_tpu.kernels.nms_pallas import nms_pallas_fixpoint

    rng = np.random.default_rng(n)
    boxes = jnp.asarray(np.stack([_boxes(rng, n) for _ in range(b)]))
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    hw = np.asarray(nms_pallas_fixpoint(boxes, scores, valid, 0.3))
    it = np.asarray(
        nms_pallas_fixpoint(boxes, scores, valid, 0.3, interpret=True)
    )
    np.testing.assert_array_equal(hw, it)


@pytest.mark.parametrize("b,n,g", [(8, 96, 6), (4, 320, 10)])
def test_nms_grouped_hw(b, n, g):
    from vdetlib_tpu.kernels.nms_pallas import nms_pallas_grouped

    rng = np.random.default_rng(n)
    boxes = jnp.asarray(np.stack([_boxes(rng, n) for _ in range(b)]))
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    groups = jnp.asarray(rng.integers(0, g, (b, n)).astype(np.int32))
    hw = np.asarray(nms_pallas_grouped(boxes, scores, valid, groups, 0.3))
    it = np.asarray(
        nms_pallas_grouped(boxes, scores, valid, groups, 0.3, interpret=True)
    )
    np.testing.assert_array_equal(hw, it)


def test_nms_batch_large_hw():
    """The v1 greedy-loop kernel path (N > 128)."""
    from vdetlib_tpu.kernels.nms_pallas import nms_pallas_batch

    rng = np.random.default_rng(7)
    b, n = 8, 200
    boxes = jnp.asarray(np.stack([_boxes(rng, n) for _ in range(b)]))
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    hw = np.asarray(nms_pallas_batch(boxes, scores, valid, 0.3))
    it = np.asarray(nms_pallas_batch(boxes, scores, valid, 0.3, interpret=True))
    np.testing.assert_array_equal(hw, it)


@pytest.mark.parametrize(
    "p,h,w", [(8, 120, 160), (8, 60, 80), (8, 24, 32), (3, 48, 64)]
)
def test_flow_level_hw(p, h, w):
    """All production grids incl. sub-128 lane widths (fast/fastest presets
    at 240×320 and the small serve/test image sizes)."""
    from vdetlib_tpu.kernels.flow_pallas import flow_level_pallas

    rng = np.random.default_rng(h * w)
    i1 = jnp.asarray(rng.uniform(0, 1, (p, h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (p, h, w)).astype(np.float32))
    hw_out = np.asarray(flow_level_pallas(i1, i2, search=5, radius=3))
    it_out = np.asarray(
        flow_level_pallas(i1, i2, search=5, radius=3, interpret=True)
    )
    np.testing.assert_allclose(hw_out, it_out, atol=0.05)


def test_preprocess_hw():
    from vdetlib_tpu.kernels.preprocess import fused_resize_normalize_pallas

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (4, 120, 160, 3), dtype=np.uint8))
    hw = np.asarray(fused_resize_normalize_pallas(frames, (96, 128)))
    it = np.asarray(
        fused_resize_normalize_pallas(frames, (96, 128), interpret=True)
    )
    np.testing.assert_allclose(hw, it, atol=1e-3)


def test_track_scan_hw():
    """The opt-in whole-scan tracker kernel (parked but must stay correct).

    Compares the COMPOSED per-anchor outputs on alive frames only — dead
    lanes carry unspecified padding (the padding convention: masked slots
    are not part of any kernel's contract), so raw lane contents may differ
    between hw and interpret without being a bug. Mirrors
    tests/test_track.py::test_pallas_scan_matches_xla_scan, on hardware.
    """
    import jax

    from vdetlib_tpu.data.synth import SynthConfig, make_video
    from vdetlib_tpu.kernels.track_pallas import track_scan_pallas
    from vdetlib_tpu.nn.tracker_net import TrackerConfig, extract_template
    from vdetlib_tpu.video.track import init_tracker, tracker_features

    T = 16
    sv = make_video(SynthConfig(num_frames=T, height=96, width=128, seed=4))
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=(96, 128), seed=0)
    feats = tracker_features(model, params, jnp.asarray(sv.frames))
    ats = jnp.asarray([2, T // 2])
    abx = jnp.asarray(
        np.stack([sv.gt_boxes[0, 2], sv.gt_boxes[1 % sv.gt_boxes.shape[0], T // 2]])
    )
    templates = jax.vmap(
        lambda at, ab: extract_template(feats[at], ab, cfg)
    )(ats, abx)
    kw = dict(
        Q=cfg.search_pool, P=cfg.template_pool, factor=cfg.search_factor,
        stride=model.stride, conf_thresh=0.3,
    )

    def compose(out):
        fb, fc, fa, bb, bc, ba = (jnp.moveaxis(v, 0, 1) for v in out)
        use_f = jnp.arange(T)[None, :] >= ats[:, None]
        return (
            np.asarray(jnp.where(use_f[..., None], fb, bb)),
            np.asarray(jnp.where(use_f, fc, bc)),
            np.asarray(jnp.where(use_f, fa, ba)),
        )

    hw_b, hw_c, hw_a = compose(track_scan_pallas(feats, ats, abx, templates, **kw))
    it_b, it_c, it_a = compose(
        track_scan_pallas(feats, ats, abx, templates, interpret=True, **kw)
    )
    np.testing.assert_array_equal(hw_a, it_a)
    assert hw_a.any()  # the problem actually tracks something
    live = it_a
    np.testing.assert_allclose(hw_b[live], it_b[live], atol=0.1)
    np.testing.assert_allclose(hw_c[live], it_c[live], atol=0.05)


def test_seq_nms_device_vs_host_oracle_hw():
    """Not a Pallas kernel, but the device while_loop DP has tie-sensitive
    numerics — assert exact oracle parity ON HARDWARE, not just CPU (the
    CPU parity lives in tests/test_seq_nms.py, same harness)."""
    from tests.oracle.seq_nms import seq_nms as oracle_seq_nms
    from vdetlib_tpu.kernels.seq_nms import seq_nms_single

    rng = np.random.default_rng(11)
    T, N = 10, 12
    base = _boxes(rng, N)
    boxes = np.zeros((T, N, 4), np.float32)
    for t in range(T):
        drift = rng.normal(0, 2.0, size=(N, 1))
        boxes[t] = base + drift * np.array([1.0, 0.5, 1.0, 0.5], np.float32)
    scores = rng.uniform(0.05, 1, (T, N)).astype(np.float32)
    mask = rng.uniform(size=(T, N)) > 0.3
    fb = [boxes[t][mask[t]] for t in range(T)]
    fs = [scores[t][mask[t]] for t in range(T)]
    out, paths = oracle_seq_nms(
        fb, fs, link_thresh=0.5, suppress_thresh=0.3, max_paths=50,
        rescore="avg",
    )
    want = np.where(mask, scores, 0.0).astype(np.float64)
    for t in range(T):
        want[t][mask[t]] = out[t]
    got, path_id = seq_nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=50,
    )
    np.testing.assert_allclose(
        np.asarray(got)[mask], want[mask], rtol=1e-5, atol=1e-5
    )
    assert int(np.asarray(path_id).max()) + 1 == len(paths)
