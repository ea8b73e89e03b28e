"""Pallas TPU kernel for batched greedy NMS.

Reference parity: ``vdetlib/utils/cython_nms.pyx`` semantics (see
kernels/nms.py for the shared contract with the numpy oracle).

TPU-native design:
- The score sort happens once in XLA (``jnp.argsort``); the kernel receives
  coordinate planes already in visit order, as ``(B, N)`` arrays — N padded to
  a lane multiple (128), B padded to a sublane multiple (8).
- Each grid step owns a ``(BLOCK_B=8, N)`` tile: 8 independent (frame, class)
  problems fill the 8 VPU sublanes, so every elementwise op in the greedy loop
  runs at full vector width. No IoU matrix is materialized — iteration i
  recomputes row i's IoU against all boxes in registers (VMEM-resident
  operands), fusing "IoU + compare + mask" into one pass.
- The greedy recurrence (keep[i] decides suppression of j > i) is a
  ``fori_loop`` carrying the keep mask; per-problem scalars come from lane
  dynamic slices, avoiding any transpose.

This is the device hot path for per-frame per-class suppression; the pure-XLA
fallback (kernels/nms.py) keeps identical semantics for CPU and debugging.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET
from vdetlib_tpu.kernels.nms import NEG_INF

BLOCK_B = 8  # problems per grid step = VPU sublane count for f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, *, n, thresh, offset):
    # Mosaic only allows lane-dim dynamic slices at 128-aligned offsets, so
    # per-iteration "box i" scalars are read by slicing the aligned 128-lane
    # block containing i and reducing it against a one-hot mask. The keep mask
    # is carried in the output ref.
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    area = (x2 - x1 + offset) * (y2 - y1 + offset)  # (8, N)
    col = jax.lax.broadcasted_iota(jnp.int32, x1.shape, dimension=1)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_B, 128), dimension=1)
    keep_ref[:] = valid_ref[:].astype(jnp.float32)

    def body(i, carry):
        blk = pl.multiple_of((i // 128) * 128, 128)
        onehot = jnp.where(col128 == (i - blk), 1.0, 0.0)  # (8, 128)

        def pick(ref):
            return jnp.sum(ref[:, pl.ds(blk, 128)] * onehot, axis=1, keepdims=True)

        bx1, by1, bx2, by2 = pick(x1_ref), pick(y1_ref), pick(x2_ref), pick(y2_ref)
        keep_i = jnp.sum(
            keep_ref[:, pl.ds(blk, 128)] * onehot, axis=1, keepdims=True
        )  # (8, 1)
        barea = (bx2 - bx1 + offset) * (by2 - by1 + offset)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1) + offset, 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1) + offset, 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = (iou > thresh) & (col > i) & (keep_i > 0)
        keep_ref[:] = jnp.where(suppress, 0.0, keep_ref[:])
        return carry

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("thresh", "offset", "interpret"))
def nms_pallas_batch(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: float,
    offset: float = LEGACY_OFFSET,
    interpret: bool = False,
) -> jax.Array:
    """Greedy NMS over a batch of padded problems, Pallas TPU kernel.

    Args:
      boxes: (B, N, 4) float32; scores: (B, N) float32; valid: (B, N) bool.
      thresh: static IoU suppression threshold (strict >).
    Returns:
      keep: (B, N) bool, aligned with the input order.
    """
    B, N = scores.shape
    n_pad = _round_up(max(N, 128), 128)
    b_pad = _round_up(max(B, BLOCK_B), BLOCK_B)

    masked = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked, axis=1, stable=True)  # (B, N)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)

    planes = [
        jnp.pad(sboxes[..., k], ((0, b_pad - B), (0, n_pad - N))) for k in range(4)
    ]
    valid_f = jnp.pad(svalid.astype(jnp.float32), ((0, b_pad - B), (0, n_pad - N)))

    kernel = functools.partial(
        _nms_kernel, n=n_pad, thresh=float(thresh), offset=float(offset)
    )
    grid = (b_pad // BLOCK_B,)
    spec = pl.BlockSpec((BLOCK_B, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep_sorted = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=spec,
        interpret=interpret,
    )(*planes, valid_f)

    keep_sorted = keep_sorted[:B, :N] > 0.5
    # Scatter from visit order back to original positions.
    keep = jax.vmap(lambda o, k: jnp.zeros((N,), bool).at[o].set(k))(order, keep_sorted)
    return keep


def batched_nms_pallas(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: float,
    offset: float = LEGACY_OFFSET,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for kernels.nms.batched_nms with the Pallas backend.

    boxes: (..., N, 4); scores/valid: (..., N) → keep: (..., N) bool.
    """
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    keep = nms_pallas_batch(
        boxes.reshape((-1, n, 4)),
        scores.reshape((-1, n)),
        valid.reshape((-1, n)),
        thresh,
        offset=offset,
        interpret=interpret,
    )
    return keep.reshape(lead + (n,))
