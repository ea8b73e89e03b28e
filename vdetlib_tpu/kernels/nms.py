"""Greedy NMS as a device program (XLA), batched via vmap.

Reference parity: ``vdetlib/utils/cython_nms.pyx`` — Fast R-CNN greedy NMS
with the legacy +1 area convention. Semantics contract (shared with the numpy
oracle in tests/oracle/nms.py): visit boxes by (score desc, index asc);
suppress when IoU with any kept box is strictly greater than ``thresh``.

TPU design notes (SURVEY.md §7 "hard parts"): greedy NMS is inherently
sequential in the kept-set, so we use the O(N²) masked formulation — one
argsort + one IoU matrix (VPU-friendly (N, N) elementwise work), then a
``fori_loop`` of N O(N) vector steps carrying the keep mask. N is a static
padded budget (proposals are pre-filtered to top-K), and the whole thing
vmaps over (frame, class) so a video snippet is a single fused device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET, pairwise_iou

NEG_INF = jnp.float32(-1e30)


def sort_by_score(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Visit order: valid first, score desc, original index asc. → order[N]."""
    masked = jnp.where(valid, scores, NEG_INF)
    # jnp.argsort is stable: ascending on -score keeps index-ascending ties.
    return jnp.argsort(-masked, stable=True)


@partial(jax.jit, static_argnames=("offset",))
def nms_xla(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: jax.Array | float,
    offset: float = LEGACY_OFFSET,
) -> tuple[jax.Array, jax.Array]:
    """Greedy NMS over one padded problem.

    Args:
      boxes: (N, 4) float32 [x1,y1,x2,y2].
      scores: (N,) float32.
      valid: (N,) bool — padding mask.
      thresh: IoU suppression threshold (strict >).
      offset: area convention (1.0 = legacy Fast R-CNN).

    Returns:
      keep: (N,) bool mask aligned with the input order.
      order: (N,) int32 visit order (for reconstructing ranked keep lists).
    """
    n = boxes.shape[0]
    order = sort_by_score(scores, valid)
    sboxes = boxes[order]
    svalid = valid[order]
    m = pairwise_iou(sboxes, sboxes, offset=offset)  # (N, N)
    suppress_mat = m > thresh

    idx = jnp.arange(n)

    def body(i, keep):
        # If box i survives, knock out every later box it overlaps too much.
        row = suppress_mat[i] & (idx > i)
        return jnp.where(keep[i], keep & ~row, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, svalid)
    # Scatter back to original positions.
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep, order


@partial(jax.jit, static_argnames=("offset",))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: jax.Array | float,
    offset: float = LEGACY_OFFSET,
) -> jax.Array:
    """NMS over a batch of independent problems.

    Args:
      boxes: (..., N, 4); scores: (..., N); valid: (..., N).
    Returns:
      keep: (..., N) bool.

    Typical use: per-frame per-class NMS with boxes tiled over classes —
    reshape (T, C, N, 4) and let vmap flatten the leading axes.
    """
    flat_boxes = boxes.reshape((-1,) + boxes.shape[-2:])
    flat_scores = scores.reshape((-1, scores.shape[-1]))
    flat_valid = valid.reshape((-1, valid.shape[-1]))
    fn = jax.vmap(lambda b, s, v: nms_xla(b, s, v, thresh, offset=offset)[0])
    keep = fn(flat_boxes, flat_scores, flat_valid)
    return keep.reshape(valid.shape)


def nms_host(dets, thresh: float, offset: float = LEGACY_OFFSET) -> list[int]:
    """Host-side NMS on dets[N, 5] → ranked keep indices (original numbering).

    Dispatches to the native C++ kernel when built (vdetlib_tpu/native), else
    a vectorized numpy fallback with identical semantics. This is the pure-CPU
    path used by config 1 (BASELINE.json:7) where no device is involved.
    """
    from vdetlib_tpu.native import nms as native_nms

    return native_nms(dets, thresh, offset)
