"""Perturbation max-pooling rescore tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.protos.arrays import arrays_to_track_proto
from vdetlib_tpu.video.perturb import (
    PerturbOptions,
    perturb_boxes,
    perturb_rescore_arrays,
    perturb_rescore_track_proto,
)

HW = (96, 128)
C = 4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = detector_preset("tiny", num_classes=C)
    # max_rois here only sizes the init dummy; apply() takes any R
    return init_detector(cfg, HW, max_rois=8, seed=0)


def test_perturb_boxes_identity_first():
    boxes = jnp.array([[10.0, 10.0, 50.0, 50.0]])
    opts = PerturbOptions(num_perturb=4)
    out = perturb_boxes(boxes, jax.random.PRNGKey(0), opts, HW[0], HW[1])
    assert out.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(boxes[0]), atol=1e-5)
    # others differ
    assert not np.allclose(np.asarray(out[0, 1]), np.asarray(boxes[0]))
    # all inside the image
    o = np.asarray(out)
    assert (o[..., 0] >= 0).all() and (o[..., 2] <= HW[1] - 1).all()


def test_max_pool_dominates_identity(tiny_model):
    """Max over perturbations ≥ the identity box's own score."""
    model, params = tiny_model
    sv = make_video(SynthConfig(num_frames=4, height=HW[0], width=HW[1], seed=3))
    K, T = sv.gt_boxes.shape[:2]
    trk_boxes = jnp.asarray(sv.gt_boxes[:, :4])
    trk_mask = jnp.ones((K, 4), bool)
    opts = PerturbOptions(num_perturb=6)
    best_scores, best_boxes = perturb_rescore_arrays(
        model, params, jnp.asarray(sv.frames[:4]), trk_boxes, trk_mask, opts
    )
    only_id = PerturbOptions(num_perturb=1)
    id_scores, _ = perturb_rescore_arrays(
        model, params, jnp.asarray(sv.frames[:4]), trk_boxes, trk_mask, only_id
    )
    assert (np.asarray(best_scores) + 1e-6 >= np.asarray(id_scores)).all()
    assert best_boxes.shape == (K, 4, 4)


def test_track_proto_update(tiny_model):
    model, params = tiny_model
    sv = make_video(SynthConfig(num_frames=6, height=HW[0], width=HW[1], seed=4))
    K, T = sv.gt_boxes.shape[:2]
    tp = arrays_to_track_proto(
        sv.gt_boxes, np.ones((K, T), np.float32), np.ones((K, T), bool),
        sv.frame_ids, sv.video, "gt",
    )
    out = perturb_rescore_track_proto(
        model, params, sv.frames, tp, sv.frame_ids,
        PerturbOptions(num_perturb=4), batch_frames=3,
    )
    assert len(out["tracks"]) == K
    for track in out["tracks"]:
        for box in track:
            assert "perturb_scores" in box
            assert len(box["bbox"]) == 4


def test_perturb_scores_feed_rescore(tiny_model):
    """ADVICE r1: the perturb stage's max-pooled scores must affect rescoring.

    A tubelet whose boxes carry strong perturb_scores boosts its matched
    detections even when the raw det scores are weak.
    """
    from vdetlib_tpu.video.rescore import RescoreOptions, tubelet_rescore

    T = 4
    fids = list(range(1, T + 1))
    vid = {"video": "v", "frames": [{"frame": f, "path": "x"} for f in fids]}
    box = [20.0, 20.0, 60.0, 60.0]
    det_proto = {
        "video": "v",
        "detections": [
            {"frame": f, "bbox": box,
             "scores": [{"class": "1", "class_index": 1, "score": 0.1}]}
            for f in fids
        ],
    }
    def track(with_perturb):
        entries = []
        for f in fids:
            e = {"frame": f, "bbox": box, "score": 1.0}
            if with_perturb:
                e["perturb_scores"] = [{"class_index": 1, "score": 0.9}]
            entries.append(e)
        return {"video": "v", "method": "m", "tracks": [entries]}

    opts = RescoreOptions(num_classes=C, max_boxes=8, max_tracks=4)
    _, plain = tubelet_rescore(vid, det_proto, track(False), opts)
    _, boosted = tubelet_rescore(vid, det_proto, track(True), opts)
    s_plain = plain["detections"][0]["scores"][0]["score"]
    s_boosted = boosted["detections"][0]["scores"][0]["score"]
    assert s_plain == pytest.approx(0.1, abs=1e-6)  # stat = own weak score
    assert s_boosted == pytest.approx(0.9, abs=1e-6)  # perturb evidence adopted
