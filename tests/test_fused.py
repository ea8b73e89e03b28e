"""Fused pipeline API: single-snippet correctness + sharded multi-device run.

(Fidelity vs the staged stages is locked separately in test_fused_parity.py.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.dist.sharding import make_mesh, replicate
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.pipeline.fused import FusedConfig, make_fused_pipeline, make_sharded_pipeline
from vdetlib_tpu.video.track import init_tracker

HW = (96, 128)
T, R, C, A = 8, 16, 4, 4
NB = 24  # out_budget


@pytest.fixture(scope="module")
def setup():
    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    cfg = FusedConfig(
        image_hw=HW, detect_batch=4, feat_batch=4, anchors_per_round=A,
        max_tracks=A, max_paths=16, det_budget=NB, out_budget=NB,
    )
    return det_model, det_params, trk_model, trk_params, trk_cfg, cfg


def _inputs(seed, n=1):
    rng = np.random.default_rng(seed)
    frames, rois = [], []
    for i in range(n):
        sv = make_video(
            SynthConfig(num_frames=T, height=HW[0], width=HW[1], num_classes=C, seed=seed + i)
        )
        r = np.zeros((T, R, 4), np.float32)
        for t in range(T):
            x1 = rng.uniform(0, HW[1] - 10, R)
            y1 = rng.uniform(0, HW[0] - 10, R)
            w = rng.uniform(8, 60, R)
            h = rng.uniform(8, 60, R)
            r[t] = np.stack(
                [x1, y1, np.minimum(x1 + w, HW[1] - 1), np.minimum(y1 + h, HW[0] - 1)],
                axis=1,
            )
        frames.append(sv.frames)
        rois.append(r)
    return np.stack(frames), np.stack(rois)


def test_fused_single(setup):
    det_model, det_params, trk_model, trk_params, trk_cfg, cfg = setup
    frames, rois = _inputs(0)
    pipe = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)
    out = pipe(det_params, trk_params, jnp.asarray(frames[0]), jnp.asarray(rois[0]))
    assert out.det_boxes.shape == (T, NB, 4)
    assert out.det_scores.shape == (T, NB, C)
    assert out.det_mask.shape == (T, NB)
    assert out.final_scores.shape == (C - 1, T, NB)
    assert out.path_ids.shape == (C - 1, T, NB)
    assert out.track_boxes.shape == (A, T, 4)
    ds = np.asarray(out.det_scores)
    assert np.isfinite(ds).all() and (ds >= 0).all() and (ds <= 1).all()
    # unmasked slots carry no scores
    mask = np.asarray(out.det_mask)
    assert (ds[~mask] == 0).all()
    # seq-NMS output scores only live on masked slots; suppressed are <= 0
    fs = np.asarray(out.final_scores)
    assert (fs[:, ~mask] <= 0).all()
    assert int(out.n_tracks) >= 1
    # every reported track has its anchor frame alive
    alive = np.asarray(out.track_alive)
    assert alive[: int(out.n_tracks)].any(axis=1).all()


def test_fused_padded_bucket_matches_unpadded(setup):
    """pad_snippet + t_valid: valid-frame outputs equal the unpadded run."""
    from vdetlib_tpu.pipeline.fused import pad_snippet

    det_model, det_params, trk_model, trk_params, trk_cfg, cfg = setup
    frames, rois = _inputs(33)
    pipe = make_fused_pipeline(det_model, trk_model, trk_cfg, cfg)
    base = pipe(det_params, trk_params, jnp.asarray(frames[0]), jnp.asarray(rois[0]))
    fp, rp, t_valid = pad_snippet(frames[0], rois[0], bucket=2 * T)
    assert fp.shape[0] == 2 * T and t_valid == T
    padded = pipe(det_params, trk_params, jnp.asarray(fp), jnp.asarray(rp), t_valid)
    np.testing.assert_array_equal(
        np.asarray(padded.det_mask)[:T], np.asarray(base.det_mask)
    )
    np.testing.assert_allclose(
        np.asarray(padded.det_scores)[:T], np.asarray(base.det_scores),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(padded.final_scores)[:, :T],
        np.asarray(base.final_scores),
        rtol=1e-4, atol=1e-4,
    )
    assert int(padded.n_tracks) == int(base.n_tracks)
    # nothing survives in the padded tail
    assert not np.asarray(padded.det_mask)[T:].any()
    assert (np.asarray(padded.final_scores)[:, T:] <= 0).all()


def test_fused_sharded_matches_vmapped(setup):
    """Sharding over the mesh must not change results vs plain vmap.

    (Exact equality vs the SINGLE-snippet program does not hold: vmapping
    the bf16 detector convs changes accumulation order by ~1e-3, which can
    flip boxes sitting exactly at NMS thresholds — so the reference here is
    the unsharded vmapped program, which has identical structure.)
    """
    from vdetlib_tpu.pipeline.fused import _make_pipeline_fn

    det_model, det_params, trk_model, trk_params, trk_cfg, cfg = setup
    mesh = make_mesh(8)
    V = 8
    frames, rois = _inputs(10, n=V)
    fn = _make_pipeline_fn(det_model, trk_model, trk_cfg, cfg)
    vmapped = jax.jit(jax.vmap(lambda f, r: fn(det_params, trk_params, f, r)))
    want = vmapped(jnp.asarray(frames), jnp.asarray(rois))
    sharded = make_sharded_pipeline(det_model, trk_model, trk_cfg, cfg, mesh)
    with mesh:
        det_p = replicate(mesh, det_params)
        trk_p = replicate(mesh, trk_params)
        got = sharded(det_p, trk_p, jnp.asarray(frames), jnp.asarray(rois))
    for name in want._fields:
        a = np.asarray(getattr(want, name))
        b = np.asarray(getattr(got, name))
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3, err_msg=name)
    # outputs really were computed sharded across the data axis
    from jax.sharding import PartitionSpec as P

    assert got.final_scores.sharding.spec == P("data")
