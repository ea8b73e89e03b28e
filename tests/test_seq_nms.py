"""Seq-NMS kernel parity vs the numpy DP oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from tests.oracle.seq_nms import best_path, seq_nms as oracle_seq_nms
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch, seq_nms_single


def _problem(rng, T, N, drop=0.2):
    """Tracks-like random problem: boxes drift smoothly so links exist."""
    base = random_boxes(rng, N)
    boxes = np.zeros((T, N, 4), np.float32)
    for t in range(T):
        drift = rng.normal(0, 2.0, size=(N, 1))
        boxes[t] = base + drift * np.array([1.0, 0.5, 1.0, 0.5], np.float32)
    scores = rng.uniform(0.05, 1.0, size=(T, N)).astype(np.float32)
    mask = rng.uniform(size=(T, N)) > drop
    return boxes, scores, mask


def _oracle_scores(boxes, scores, mask, link, supp, max_paths, rescore):
    """Run the ragged oracle and scatter results back to the padded layout."""
    T, N = mask.shape
    fb = [boxes[t][mask[t]] for t in range(T)]
    fs = [scores[t][mask[t]] for t in range(T)]
    out, paths = oracle_seq_nms(
        fb, fs, link_thresh=link, suppress_thresh=supp, max_paths=max_paths,
        rescore=rescore,
    )
    full = np.where(mask, scores, 0.0).astype(np.float64)
    for t in range(T):
        full[t][mask[t]] = out[t]
    return full, paths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T, N = 8, 12
    boxes, scores, mask = _problem(rng, T, N)
    want, paths = _oracle_scores(boxes, scores, mask, 0.5, 0.3, 50, "avg")
    got, path_id = seq_nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=50,
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5, atol=1e-5)
    # path count agrees
    n_paths_dev = int(np.asarray(path_id).max()) + 1
    assert n_paths_dev == len(paths)


def test_max_rescore_mode():
    rng = np.random.default_rng(3)
    boxes, scores, mask = _problem(rng, 6, 8)
    want, _ = _oracle_scores(boxes, scores, mask, 0.5, 0.3, 50, "max")
    got, _ = seq_nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=50, rescore="max",
    )
    np.testing.assert_allclose(np.asarray(got)[mask], want[mask], rtol=1e-5, atol=1e-5)


def test_empty_problem():
    T, N = 4, 6
    got, path_id = seq_nms_single(
        jnp.zeros((T, N, 4)), jnp.zeros((T, N)), jnp.zeros((T, N), bool), 0.5, 0.3,
        max_paths=10,
    )
    np.testing.assert_allclose(np.asarray(got), 0.0)
    assert int(np.asarray(path_id).max()) == -1


def test_single_chain_rescored_to_avg():
    """One obvious chain across all frames → every box gets the avg score."""
    T = 5
    box = np.array([10.0, 10.0, 50.0, 50.0], np.float32)
    boxes = np.tile(box, (T, 1, 1))
    scores = np.linspace(0.4, 0.8, T, dtype=np.float32).reshape(T, 1)
    mask = np.ones((T, 1), bool)
    got, path_id = seq_nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=5,
    )
    np.testing.assert_allclose(np.asarray(got), scores.mean(), rtol=1e-6)
    assert (np.asarray(path_id) == 0).all()


def test_batch_vmap_consistency():
    rng = np.random.default_rng(4)
    T, N, C = 6, 10, 3
    boxes, _, _ = _problem(rng, T, N)
    scores = rng.uniform(0.05, 1, size=(C, T, N)).astype(np.float32)
    mask = rng.uniform(size=(C, T, N)) > 0.3
    out_b, pid_b = seq_nms_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=30,
    )
    for c in range(C):
        out_s, pid_s = seq_nms_single(
            jnp.asarray(boxes), jnp.asarray(scores[c]), jnp.asarray(mask[c]),
            0.5, 0.3, max_paths=30,
        )
        np.testing.assert_allclose(np.asarray(out_b[c]), np.asarray(out_s), rtol=1e-6)


def test_host_backend_matches_device():
    rng = np.random.default_rng(9)
    T, N, C = 6, 10, 3
    boxes, _, _ = _problem(rng, T, N)
    scores = rng.uniform(0.05, 1, size=(C, T, N)).astype(np.float32)
    mask = rng.uniform(size=(C, T, N)) > 0.3
    from vdetlib_tpu.kernels.seq_nms_host import seq_nms_batch_host

    oh, ph = seq_nms_batch_host(boxes, scores, mask, 0.5, 0.3, max_paths=30)
    od, pd = seq_nms_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5, 0.3,
        max_paths=30,
    )
    np.testing.assert_allclose(oh, np.asarray(od), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ph, np.asarray(pd))


def test_oracle_best_path_sanity():
    """The oracle itself: a strong chain beats isolated high scores."""
    box = [10.0, 10.0, 50.0, 50.0]
    far = [200.0, 100.0, 280.0, 180.0]
    fb = [np.array([box, far]), np.array([box, far]), np.array([box])]
    fs = [np.array([0.5, 0.9]), np.array([0.5, 0.05]), np.array([0.5])]
    total, path = best_path(fb, fs, link_thresh=0.5)
    assert total == pytest.approx(1.5)
    assert path == [(0, 0), (1, 0), (2, 0)]
