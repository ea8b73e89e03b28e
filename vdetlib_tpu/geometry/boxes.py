"""Box operations in jnp (jit/vmap-friendly, trailing-axis convention).

Reference parity notes:
- ``pairwise_iou`` matches ``vdetlib/utils/common.py::iou`` and the overlap
  computation inside ``vdetlib/utils/cython_nms.pyx`` (Fast R-CNN): pixel boxes
  with ``w = x2 - x1 + 1`` (``offset=1.0``). Pass ``offset=0.0`` for the modern
  continuous-coordinate convention.
- ``apply_deltas``/``encode_deltas`` are the standard R-CNN box regression
  transform (dx,dy,dw,dh) used by the reference's detection stage
  (``vdetlib/vid/detect.py``; SURVEY.md §3.1).
"""

from __future__ import annotations

import jax.numpy as jnp

LEGACY_OFFSET = 1.0  # Fast R-CNN integer-pixel convention: w = x2 - x1 + 1

# Clamp on dw/dh before exp, as in py-faster-rcnn (log(1000/16)).
_DELTA_CLAMP = 4.135166556742356


def box_wh(boxes, offset: float = LEGACY_OFFSET):
    """Widths and heights of (..., 4) boxes."""
    w = boxes[..., 2] - boxes[..., 0] + offset
    h = boxes[..., 3] - boxes[..., 1] + offset
    return w, h


def box_area(boxes, offset: float = LEGACY_OFFSET):
    w, h = box_wh(boxes, offset)
    return w * h


def box_center(boxes, offset: float = LEGACY_OFFSET):
    """(cx, cy) of (..., 4) boxes."""
    w, h = box_wh(boxes, offset)
    cx = boxes[..., 0] + 0.5 * (w - offset)
    cy = boxes[..., 1] + 0.5 * (h - offset)
    return cx, cy


def pairwise_iou(boxes_a, boxes_b, offset: float = LEGACY_OFFSET):
    """IoU matrix between (..., Na, 4) and (..., Nb, 4) → (..., Na, Nb)."""
    a = boxes_a[..., :, None, :]  # (..., Na, 1, 4)
    b = boxes_b[..., None, :, :]  # (..., 1, Nb, 4)
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.maximum(ix2 - ix1 + offset, 0.0)
    ih = jnp.maximum(iy2 - iy1 + offset, 0.0)
    inter = iw * ih
    area_a = box_area(boxes_a, offset)[..., :, None]
    area_b = box_area(boxes_b, offset)[..., None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def elementwise_iou(boxes_a, boxes_b, offset: float = LEGACY_OFFSET):
    """IoU between aligned (..., 4) box arrays → (...)."""
    ix1 = jnp.maximum(boxes_a[..., 0], boxes_b[..., 0])
    iy1 = jnp.maximum(boxes_a[..., 1], boxes_b[..., 1])
    ix2 = jnp.minimum(boxes_a[..., 2], boxes_b[..., 2])
    iy2 = jnp.minimum(boxes_a[..., 3], boxes_b[..., 3])
    iw = jnp.maximum(ix2 - ix1 + offset, 0.0)
    ih = jnp.maximum(iy2 - iy1 + offset, 0.0)
    inter = iw * ih
    union = box_area(boxes_a, offset) + box_area(boxes_b, offset) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def clip_boxes(boxes, height, width, offset: float = LEGACY_OFFSET):
    """Clip (..., 4) boxes to image bounds [0, W-offset] × [0, H-offset]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - offset)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - offset)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - offset)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def apply_deltas(boxes, deltas, offset: float = LEGACY_OFFSET):
    """Apply R-CNN regression deltas (..., 4) to boxes (..., 4).

    Standard bbox_transform_inv: the network predicts (dx, dy, dw, dh) in
    units of the source box; dw/dh are clamped before exp for stability.
    """
    w, h = box_wh(boxes, offset)
    cx, cy = box_center(boxes, offset)
    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.clip(deltas[..., 2], -_DELTA_CLAMP, _DELTA_CLAMP)
    dh = jnp.clip(deltas[..., 3], -_DELTA_CLAMP, _DELTA_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    x1 = pcx - 0.5 * (pw - offset)
    y1 = pcy - 0.5 * (ph - offset)
    x2 = pcx + 0.5 * (pw - offset)
    y2 = pcy + 0.5 * (ph - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_deltas(src_boxes, dst_boxes, offset: float = LEGACY_OFFSET, eps: float = 1e-6):
    """Regression targets (dx, dy, dw, dh) taking src boxes onto dst boxes."""
    sw, sh = box_wh(src_boxes, offset)
    scx, scy = box_center(src_boxes, offset)
    dw_, dh_ = box_wh(dst_boxes, offset)
    dcx, dcy = box_center(dst_boxes, offset)
    sw = jnp.maximum(sw, eps)
    sh = jnp.maximum(sh, eps)
    dx = (dcx - scx) / sw
    dy = (dcy - scy) / sh
    dw = jnp.log(jnp.maximum(dw_, eps) / sw)
    dh = jnp.log(jnp.maximum(dh_, eps) / sh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def shift_boxes(boxes, shift_xy):
    """Translate (..., 4) boxes by (..., 2) per-box (dx, dy) — the MGP shift."""
    dx, dy = shift_xy[..., 0], shift_xy[..., 1]
    return jnp.stack(
        [boxes[..., 0] + dx, boxes[..., 1] + dy, boxes[..., 2] + dx, boxes[..., 3] + dy],
        axis=-1,
    )
