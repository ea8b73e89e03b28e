"""Geometry numerics: IoU conventions, R-CNN delta transforms, clipping."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from tests.oracle.nms import iou_single
from vdetlib_tpu.geometry import (
    apply_deltas,
    box_area,
    box_center,
    clip_boxes,
    elementwise_iou,
    encode_deltas,
    pairwise_iou,
    shift_boxes,
)
from vdetlib_tpu.utils.common import iou as np_iou


def test_pairwise_iou_matches_scalar_oracle(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 13)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[iou_single(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_numpy_iou_matches_jnp(rng):
    a = random_boxes(rng, 9)
    b = random_boxes(rng, 11)
    np.testing.assert_allclose(
        np_iou(a, b), np.asarray(pairwise_iou(a, b)), rtol=1e-5, atol=1e-6
    )


def test_iou_identity_and_disjoint():
    box = np.array([[10.0, 10.0, 20.0, 20.0]])
    far = np.array([[100.0, 100.0, 120.0, 130.0]])
    assert float(pairwise_iou(box, box)[0, 0]) == pytest.approx(1.0, abs=1e-6)
    assert float(pairwise_iou(box, far)[0, 0]) == 0.0


def test_legacy_offset_convention():
    # 10x10 box in legacy convention: x2-x1+1 = 11 → area 121.
    box = jnp.array([0.0, 0.0, 10.0, 10.0])
    assert float(box_area(box)) == 121.0
    assert float(box_area(box, offset=0.0)) == 100.0
    cx, cy = box_center(box)
    assert float(cx) == 5.0 and float(cy) == 5.0


def test_elementwise_iou_diagonal(rng):
    a = random_boxes(rng, 8)
    b = random_boxes(rng, 8)
    full = np.asarray(pairwise_iou(a, b))
    diag = np.asarray(elementwise_iou(a, b))
    np.testing.assert_allclose(np.diag(full), diag, rtol=1e-6)


def test_delta_roundtrip(rng):
    src = random_boxes(rng, 32)
    dst = random_boxes(rng, 32)
    deltas = encode_deltas(src, dst)
    rec = np.asarray(apply_deltas(src, deltas))
    # fp32 pixel coordinates: worst case a few thousandths of a pixel.
    np.testing.assert_allclose(rec, dst, rtol=1e-4, atol=1e-2)


def test_zero_deltas_identity(rng):
    src = random_boxes(rng, 8)
    rec = np.asarray(apply_deltas(src, jnp.zeros((8, 4))))
    np.testing.assert_allclose(rec, src, rtol=1e-5, atol=1e-4)


def test_clip_boxes():
    boxes = jnp.array([[-5.0, -5.0, 400.0, 300.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(clip_boxes(boxes, height=240, width=320))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 319.0, 239.0])
    np.testing.assert_allclose(out[1], [10.0, 10.0, 20.0, 20.0])


def test_shift_boxes():
    boxes = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    out = np.asarray(shift_boxes(boxes, jnp.array([[2.0, -3.0]])))
    np.testing.assert_allclose(out[0], [12.0, 17.0, 32.0, 37.0])


def test_batched_shapes(rng):
    a = random_boxes(rng, 6).reshape(2, 3, 4)
    b = random_boxes(rng, 6).reshape(2, 3, 4)
    assert pairwise_iou(a, b).shape == (2, 3, 3)
    assert elementwise_iou(a, b).shape == (2, 3)
    assert apply_deltas(a, jnp.zeros((2, 3, 4))).shape == (2, 3, 4)
