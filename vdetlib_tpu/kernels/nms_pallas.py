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
BLOCK_R = 16  # packed rows per grid step in the v2 fixpoint kernel
BLOCK_R_2D = 32  # packed rows per grid step in the v3 flattened variant


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fixpoint_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, s_ref, valid_ref, grp_ref, keep_ref,
    *, thresh, offset, max_iters,
):
    """Sort-free greedy-NMS fixpoint over BLOCK_R packed 128-lane rows.

    Each row packs 128//n_pad independent problems side by side (group ids in
    ``grp_ref`` separate them). The (R, 128, 128) suppression adjacency is
    built and consumed entirely in VMEM — the XLA formulation's dominant cost
    is streaming that adjacency through HBM every Jacobi iteration.
    """
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    s, validf, grp = s_ref[:], valid_ref[:], grp_ref[:]

    row = lambda v: v[:, :, None]  # suppressee axis i
    col = lambda v: v[:, None, :]  # suppressor axis j
    ix1 = jnp.maximum(row(x1), col(x1))
    iy1 = jnp.maximum(row(y1), col(y1))
    ix2 = jnp.minimum(row(x2), col(x2))
    iy2 = jnp.minimum(row(y2), col(y2))
    iw = jnp.maximum(ix2 - ix1 + offset, 0.0)
    ih = jnp.maximum(iy2 - iy1 + offset, 0.0)
    inter = iw * ih
    area = (x2 - x1 + offset) * (y2 - y1 + offset)
    union = row(area) + col(area) - inter
    iou = jnp.where(union > 0, inter / union, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, x1.shape, dimension=1)
    # j precedes i in the greedy visit order: higher score, or tie + lower
    # index. Within a group, lane order IS the original index order.
    prec = (col(s) > row(s)) | ((col(s) == row(s)) & (col(lane) < row(lane)))
    m = (
        (iou > thresh)
        & prec
        & (col(validf) > 0)
        & (row(grp) == col(grp))
    ).astype(jnp.float32)

    def step(keep):
        suppressed = jnp.sum(m * keep[:, None, :], axis=-1) > 0.5
        return validf * (1.0 - suppressed.astype(jnp.float32))

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        # 4 Jacobi steps per convergence check: extra steps past the fixpoint
        # are no-ops, and the scalar any() sync is the per-iteration overhead.
        new = step(step(step(step(keep))))
        return new, keep, it + 4

    # prev = validf - 1 differs from validf everywhere → always ≥ 1 iteration.
    keep, _, _ = jax.lax.while_loop(
        cond, body, (validf, validf - 1.0, jnp.int32(0))
    )
    keep_ref[:] = keep


def _fixpoint2d_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, s_ref, valid_ref, grp_ref, keep_ref,
    *, thresh, offset, max_iters, block_r,
):
    """v3 probe: the fixpoint adjacency built/consumed as a 2D-flattened
    (block_r·128, 128) array instead of v2's (block_r, 128, 128).

    Motivation (ROADMAP / RESULTS.md round-2): the 3D build is
    materialization-bound — ~4× off the naive VPU estimate — because the
    ``v[:, :, None]`` suppressee broadcasts relayout lane data into sublanes
    per slab. Here every plane stays in its native (sublane, lane) layout:
    flat row k = j·block_r + r (suppressor j = copy index of a
    ``pltpu.repeat``, suppressee i = lane), suppressor scalars come from a
    one-hot lane reduce, and the Jacobi reduction over suppressors is a
    leading-dim reshape-split + sum — all probe-verified lowerings
    (scripts/probe_adj_lowering.py).
    """
    n = x1_ref.shape[1]
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    s, validf = s_ref[:], valid_ref[:]
    grp = grp_ref[:].astype(jnp.float32)  # ids < 2^24: exact in f32

    rep = lambda v: pltpu.repeat(v, n, axis=0)  # [k, i] = v[k % block_r, i]
    flat = (block_r * n, n)
    kflat = jax.lax.broadcasted_iota(jnp.int32, flat, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, flat, 1)
    jidx = kflat // block_r  # suppressor index j of flat row k
    onehot = (lane == jidx).astype(jnp.float32)

    def pick(rv):  # suppressor-j scalar per flat row, (block_r·n, 1)
        return jnp.sum(rv * onehot, axis=1, keepdims=True)

    X1, Y1, X2, Y2 = rep(x1), rep(y1), rep(x2), rep(y2)
    jx1, jy1, jx2, jy2 = pick(X1), pick(Y1), pick(X2), pick(Y2)
    iw = jnp.maximum(jnp.minimum(X2, jx2) - jnp.maximum(X1, jx1) + offset, 0.0)
    ih = jnp.maximum(jnp.minimum(Y2, jy2) - jnp.maximum(Y1, jy1) + offset, 0.0)
    inter = iw * ih
    area_i = (X2 - X1 + offset) * (Y2 - Y1 + offset)
    area_j = (jx2 - jx1 + offset) * (jy2 - jy1 + offset)
    union = area_i + area_j - inter
    iou = jnp.where(union > 0, inter / union, 0.0)

    S, G, V = rep(s), rep(grp), rep(validf)
    js, jg, jv = pick(S), pick(G), pick(V)
    # j precedes i in greedy visit order (same relation as v2).
    prec = (js > S) | ((js == S) & (jidx < lane))
    m = (
        (iou > thresh) & prec & (jv > 0) & (jg == G)
    ).astype(jnp.float32)  # [k = j·block_r + r, i]

    def step(keep):
        w = pick(rep(keep))  # w[k] = keep[r, j]
        contrib = (m * w).reshape(n, block_r, n)  # [j, r, i] leading split
        suppressed = jnp.sum(contrib, axis=0) > 0.5  # (block_r, n)
        return validf * (1.0 - suppressed.astype(jnp.float32))

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        new = step(step(step(step(keep))))
        return new, keep, it + 4

    keep, _, _ = jax.lax.while_loop(
        cond, body, (validf, validf - 1.0, jnp.int32(0))
    )
    keep_ref[:] = keep


def _pack_width(n: int) -> int:
    """Smallest divisor of 128 that holds an n-box problem."""
    for d in (8, 16, 32, 64, 128):
        if n <= d:
            return d
    raise ValueError(f"fixpoint kernel packs at most 128 boxes, got {n}")


@functools.partial(
    jax.jit, static_argnames=("thresh", "offset", "interpret", "variant")
)
def nms_pallas_fixpoint(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: float,
    offset: float = LEGACY_OFFSET,
    interpret: bool = False,
    variant: str = "adj2d",
) -> jax.Array:
    """Sort-free greedy NMS, Pallas TPU kernel — the production path.

    Exact keep-set parity with kernels/nms.py::nms_unsorted_fixpoint (and the
    numpy oracle): same precedence relation, same strict-> threshold, same
    tie-breaks. Problems are packed 128//n_pad per lane row; the per-row
    suppression adjacency lives only in VMEM, cutting HBM traffic from
    O(B·N²) per Jacobi iteration to O(B·N) total.

    boxes: (B, N, 4) f32; scores/valid: (B, N); N ≤ 128 → keep (B, N) bool.
    The default ``variant="adj2d"`` (v3) builds the adjacency 2D-flattened
    with every plane in native (sublane, lane) layout — measured 233 vs 166
    Mboxes/s for the v2 broadcast build at the bench NMS shape
    (scripts/probe_adj2d.py, chip). ``variant="v2"`` keeps the original
    (block_r, 128, 128) kernel selectable.
    """
    B, N = scores.shape
    block_r = BLOCK_R if variant == "v2" else BLOCK_R_2D
    n_pad = _pack_width(N)
    pack = 128 // n_pad
    b2 = _round_up(max(B, 1), pack) // pack
    b2_pad = _round_up(b2, block_r)
    Bp = b2_pad * pack

    def plane(v, fill=0.0):
        v = jnp.pad(v, ((0, Bp - B), (0, n_pad - N)), constant_values=fill)
        return v.reshape(b2_pad, 128)

    s_masked = jnp.where(valid, scores, NEG_INF)
    planes = [plane(boxes[..., k]) for k in range(4)]
    planes.append(plane(s_masked, fill=NEG_INF))
    planes.append(plane(valid.astype(jnp.float32)))
    groups = jnp.broadcast_to(
        jnp.arange(Bp, dtype=jnp.int32)[:, None], (Bp, n_pad)
    ).reshape(b2_pad, 128)

    if variant == "v2":
        kernel = functools.partial(
            _fixpoint_kernel,
            thresh=float(thresh),
            offset=float(offset),
            max_iters=n_pad,
        )
    else:
        kernel = functools.partial(
            _fixpoint2d_kernel,
            thresh=float(thresh),
            offset=float(offset),
            max_iters=n_pad,
            block_r=block_r,
        )
    spec = pl.BlockSpec((block_r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b2_pad, 128), jnp.float32),
        grid=(b2_pad // block_r,),
        in_specs=[spec] * 6 + [spec],
        out_specs=spec,
        interpret=interpret,
    )(*planes, groups)

    return keep.reshape(Bp, n_pad)[:B, :N] > 0.5


@functools.partial(
    jax.jit, static_argnames=("thresh", "offset", "interpret")
)
def nms_pallas_grouped(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    groups: jax.Array,
    thresh: float,
    offset: float = LEGACY_OFFSET,
    interpret: bool = False,
) -> jax.Array:
    """Grouped greedy NMS (disjoint sub-problems sharing one slot axis) on
    the same Pallas fixpoint kernel — multi-tile rows, no lane packing.

    Exact parity with kernels/nms.py::nms_grouped. Used by the fused pipeline
    where each frame's slot axis carries every class's detections at once.

    boxes: (B, N, 4); scores/valid/groups: (B, N); N ≤ 512 → keep (B, N).
    """
    B, N = scores.shape
    n_pad = _round_up(max(N, 128), 128)
    if n_pad > 512:
        raise ValueError(f"grouped fixpoint kernel caps at 512 slots, got {N}")
    # Cap the in-VMEM adjacency at ~4MB: R · n_pad² · 4 bytes.
    block_p = max(1, min(16, (4 * 1024 * 1024) // (n_pad * n_pad * 4)))
    b_pad = _round_up(max(B, block_p), block_p)

    def plane(v, fill=0.0):
        return jnp.pad(
            v, ((0, b_pad - B), (0, n_pad - N)), constant_values=fill
        )

    s_masked = jnp.where(valid, scores, NEG_INF)
    planes = [plane(boxes[..., k]) for k in range(4)]
    planes.append(plane(s_masked, fill=NEG_INF))
    planes.append(plane(valid.astype(jnp.float32)))
    gplane = plane(groups.astype(jnp.int32), fill=-1)

    kernel = functools.partial(
        _fixpoint_kernel,
        thresh=float(thresh),
        offset=float(offset),
        max_iters=n_pad,
    )
    spec = pl.BlockSpec(
        (block_p, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        grid=(b_pad // block_p,),
        in_specs=[spec] * 7,
        out_specs=spec,
        interpret=interpret,
    )(*planes, gplane)

    return keep[:B, :N] > 0.5


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
    Dispatches to the packed fixpoint kernel (N ≤ 128, adj2d variant);
    larger problems use the v1 greedy-loop kernel.
    """
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    fn = nms_pallas_fixpoint if n <= 128 else nms_pallas_batch
    keep = fn(
        boxes.reshape((-1, n, 4)),
        scores.reshape((-1, n)),
        valid.reshape((-1, n)),
        thresh,
        offset=offset,
        interpret=interpret,
    )
    return keep.reshape(lead + (n,))
