"""Parity tests for the Pallas NMS kernel (interpret mode on CPU) and the
MXU fixpoint formulation. Real-TPU parity of the compiled kernel is exercised
by bench.py / the driver's entry checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from tests.oracle.nms import nms as oracle_nms
from vdetlib_tpu.kernels.nms import batched_nms, nms_fixpoint
from vdetlib_tpu.kernels.nms import nms_unsorted_fixpoint
from vdetlib_tpu.kernels.nms_pallas import (
    batched_nms_pallas,
    nms_pallas_batch,
    nms_pallas_fixpoint,
    nms_pallas_grouped,
)


def _batch(rng, b, n, ties=False):
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0.01, 1.0, size=(b, n)).astype(np.float32)
    if ties:
        scores = (np.round(scores * 8) / 8).astype(np.float32)
    valid = rng.uniform(size=(b, n)) > 0.15
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


@pytest.mark.parametrize("b,n", [(1, 16), (8, 64), (20, 130)])
def test_pallas_interpret_matches_xla(rng, b, n):
    boxes, scores, valid = _batch(rng, b, n, ties=True)
    kp = np.asarray(nms_pallas_batch(boxes, scores, valid, 0.3, interpret=True))
    kx = np.asarray(batched_nms(boxes, scores, valid, 0.3))
    np.testing.assert_array_equal(kp, kx)


def test_pallas_wrapper_shape(rng):
    boxes, scores, valid = _batch(rng, 6, 32)
    keep = batched_nms_pallas(
        boxes.reshape(2, 3, 32, 4),
        scores.reshape(2, 3, 32),
        valid.reshape(2, 3, 32),
        0.5,
        interpret=True,
    )
    assert keep.shape == (2, 3, 32)


@pytest.mark.parametrize("thresh", [0.1, 0.3, 0.6])
def test_fixpoint_matches_oracle(rng, thresh):
    n = 150
    boxes = random_boxes(rng, n)
    scores = (np.round(rng.uniform(0.01, 1, n) * 8) / 8).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = set(oracle_nms(dets, thresh))
    keep = nms_fixpoint(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None], jnp.ones((1, n), bool), thresh
    )
    got = set(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert got == want


@pytest.mark.parametrize("variant", ["v2", "adj2d"])
@pytest.mark.parametrize("b,n", [(1, 16), (8, 64), (13, 64), (5, 100), (3, 128)])
def test_pallas_fixpoint_matches_xla(rng, b, n, variant):
    """The packed-lane fixpoint kernel (production TPU path: adj2d; v2 kept
    selectable) vs the XLA fixpoint — exact keep-set equality including
    score ties and padding."""
    boxes, scores, valid = _batch(rng, b, n, ties=True)
    kp = np.asarray(
        nms_pallas_fixpoint(
            boxes, scores, valid, 0.3, interpret=True, variant=variant
        )
    )
    kx = np.asarray(batched_nms(boxes, scores, valid, 0.3))
    np.testing.assert_array_equal(kp, kx)


@pytest.mark.parametrize("variant", ["v2", "adj2d"])
@pytest.mark.parametrize("thresh", [0.1, 0.5])
def test_pallas_fixpoint_matches_oracle(rng, thresh, variant):
    n = 64
    boxes = random_boxes(rng, n)
    scores = (np.round(rng.uniform(0.01, 1, n) * 8) / 8).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = set(oracle_nms(dets, thresh))
    keep = nms_pallas_fixpoint(
        jnp.asarray(boxes)[None],
        jnp.asarray(scores)[None],
        jnp.ones((1, n), bool),
        thresh,
        interpret=True,
        variant=variant,
    )
    got = set(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert got == want


@pytest.mark.parametrize("b,n,g", [(4, 60, 3), (2, 192, 6), (1, 300, 10)])
def test_pallas_grouped_matches_xla(rng, b, n, g):
    """Multi-tile grouped kernel (fused-pipeline dedup path) vs the XLA
    grouped fixpoint — exact equality over block-diagonal sub-problems."""
    boxes, scores, valid = _batch(rng, b, n, ties=True)
    groups = jnp.asarray(rng.integers(0, g, size=(b, n)).astype(np.int32))
    kp = np.asarray(
        nms_pallas_grouped(boxes, scores, valid, groups, 0.3, interpret=True)
    )
    kx = np.asarray(
        nms_unsorted_fixpoint(boxes, scores, valid, 0.3, groups=groups)
    )
    np.testing.assert_array_equal(kp, kx)


def test_fixpoint_batch_matches_loop(rng):
    boxes, scores, valid = _batch(rng, 12, 96, ties=True)
    kf = np.asarray(nms_fixpoint(boxes, scores, valid, 0.4))
    kx = np.asarray(batched_nms(boxes, scores, valid, 0.4))
    np.testing.assert_array_equal(kf, kx)
