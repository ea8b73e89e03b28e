"""Template EMA adaptation (TrackerConfig.template_eta) — the tracker-
localization lever for appearance drift (VERDICT r4 item 4 / RESULTS.md
"Track-error attribution": localization is the largest open slice, and the
hard tier drifts object appearance ±35%)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, hard_config, make_video
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.utils.common import iou
from vdetlib_tpu.video.stream import track_chunk
from vdetlib_tpu.video.track import init_tracker, track_batch, tracker_features

T = 16
HW = (240, 320)


@pytest.fixture(scope="module")
def drift_setup():
    # strong appearance drift, no occluders/distractors/pan: isolates the
    # template-staleness failure mode the EMA targets
    sv = make_video(hard_config(
        num_frames=T, seed=11, height=HW[0], width=HW[1],
        num_occluders=0, num_distractors=0, camera_pan_amp=0.0,
        camera_jitter=0.0, appearance_drift=0.6,
    ))
    cfg0 = TrackerConfig()
    model, params = init_tracker(cfg0, image_hw=HW, seed=0)
    feats = tracker_features(model, params, jnp.asarray(sv.frames))
    return sv, model, feats


def _run(sv, model, feats, cfg, conf_thresh=0.3):
    K = sv.gt_boxes.shape[0]
    anchor_t = jnp.asarray([0] * K)
    anchor_boxes = jnp.asarray(sv.gt_boxes[:, 0])
    return track_batch(model, cfg, feats, anchor_t, anchor_boxes, conf_thresh)


def test_eta_zero_matches_default_config(drift_setup):
    """template_eta=0.0 must be the byte-identical legacy program."""
    sv, model, feats = drift_setup
    b0, c0, a0 = _run(sv, model, feats, TrackerConfig())
    b1, c1, a1 = _run(sv, model, feats, TrackerConfig(template_eta=0.0))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_eta_adapts_and_preserves_contract(drift_setup):
    """With drift, the adapted tracker must (a) keep the anchor contract,
    (b) actually change the rollout, and (c) not lose GT-following vs the
    frozen template (allowing a small tolerance — the claim 'EMA helps on
    the hard tier' is settled on-chip by the mAP ablation, not here)."""
    sv, model, feats = drift_setup
    K = sv.gt_boxes.shape[0]
    bf, cf, af = map(np.asarray, _run(sv, model, feats, TrackerConfig()))
    be, ce, ae = map(
        np.asarray, _run(sv, model, feats, TrackerConfig(template_eta=0.1))
    )
    # anchor contract
    for k in range(K):
        np.testing.assert_array_equal(be[k, 0], sv.gt_boxes[k, 0])
        assert ae[k, 0] and ce[k, 0] == 1.0
    # the adapted rollout differs (precondition: the lever actually engages)
    assert np.abs(be - bf).max() > 0.5
    # GT-following must not collapse
    def mean_iou(b, a):
        vals = []
        for k in range(K):
            for t in range(T):
                if a[k, t] and sv.gt_visible[k, t]:
                    vals.append(
                        iou(b[k, t:t + 1], sv.gt_boxes[k, t:t + 1])[0, 0]
                    )
        return float(np.mean(vals))
    mf, me = mean_iou(bf, af), mean_iou(be, ae)
    assert me > mf - 0.05, (me, mf)


def test_eta_confidence_gate_blocks_updates(drift_setup):
    """With an impossible update threshold the EMA never fires: identical
    to the frozen-template rollout (the gate is what prevents template
    walk-off onto occluders)."""
    sv, model, feats = drift_setup
    b0, c0, a0 = _run(sv, model, feats, TrackerConfig())
    bg, cg, ag = _run(
        sv, model, feats,
        TrackerConfig(template_eta=0.1, template_update_conf=2.0),
    )
    np.testing.assert_allclose(
        np.asarray(b0), np.asarray(bg), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(ag))


def test_track_chunk_template_carry():
    """Streaming: track_chunk returns the input templates untouched at
    eta=0 and an adapted carry at eta>0 (both stream engines share this
    function — the engine-parity surface)."""
    sv = make_video(SynthConfig(num_frames=8, seed=3, height=HW[0],
                                width=HW[1]))
    cfg0 = TrackerConfig()
    model, params = init_tracker(cfg0, image_hw=HW, seed=0)
    feats = tracker_features(model, params, jnp.asarray(sv.frames))
    from vdetlib_tpu.nn.tracker_net import extract_template

    boxes0 = jnp.asarray(sv.gt_boxes[:, 0])
    A = boxes0.shape[0]
    tmpl = jnp.stack([
        extract_template(feats[0], boxes0[k], cfg0) for k in range(A)
    ])
    alive0 = jnp.ones((A,), bool)
    *_, tpl_end0 = track_chunk(cfg0, feats, tmpl, boxes0, alive0, 0.2)
    np.testing.assert_array_equal(np.asarray(tpl_end0), np.asarray(tmpl))
    cfge = TrackerConfig(template_eta=0.2, template_update_conf=0.3)
    bs, cs, al, _, _, tpl_end1 = track_chunk(
        cfge, feats, tmpl, boxes0, alive0, 0.2
    )
    assert np.asarray(al).any()
    assert np.abs(np.asarray(tpl_end1) - np.asarray(tmpl)).max() > 1e-4
    # adapted templates stay unit-norm (NCC stays a cosine similarity)
    changed = (
        np.abs(np.asarray(tpl_end1) - np.asarray(tmpl))
        .reshape(A, -1).max(axis=1) > 1e-4
    )
    norms = np.sqrt((np.asarray(tpl_end1) ** 2).sum(axis=(1, 2, 3)))
    np.testing.assert_allclose(norms[changed], 1.0, atol=1e-3)
