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

import numpy as np

# numpy scalar, NOT jnp: a module-level device array would initialize the
# XLA backend at import time (breaking jax.distributed.initialize ordering)
NEG_INF = np.float32(-1e30)


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
def nms_fixpoint(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: jax.Array | float,
    offset: float = LEGACY_OFFSET,
) -> jax.Array:
    """Greedy NMS via Jacobi fixpoint iteration — the MXU formulation.

    The greedy recursion ``keep[i] = valid[i] ∧ ¬∃ j<i: M[i,j] ∧ keep[j]``
    (M = IoU>thresh in visit order, strictly lower-triangular) has a unique
    solution — the greedy keep set. Jacobi iteration ``keep ← valid ∧
    ¬(M·keep > 0)`` converges to it in D steps, where D is the depth of the
    suppression DAG (typically < 10), and each step is one batched
    matrix-vector product that XLA maps onto the MXU — versus N sequential
    VPU steps for the masked-greedy loop. Exact keep-set parity with the
    oracle, including tie-breaks (ties are resolved by the stable sort).

    Args/returns: same as :func:`nms_xla` but keep mask only.
    """
    n = boxes.shape[-2]
    order = sort_by_score(scores, valid)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=-2)
    svalid = jnp.take_along_axis(valid, order, axis=-1)
    iou = pairwise_iou(sboxes, sboxes, offset=offset)
    idx = jnp.arange(n)
    lower = idx[:, None] > idx[None, :]  # row i suppressed by earlier col j
    m = ((iou > thresh) & lower & svalid[..., None, :]).astype(jnp.float32)
    svalid_f = svalid.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        suppressed = (
            jnp.einsum("...ij,...j->...i", m, keep, preferred_element_type=jnp.float32)
            > 0.5
        )
        new_keep = svalid_f * (1.0 - suppressed.astype(jnp.float32))
        return new_keep, keep, it + 1

    keep0 = svalid_f
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.full_like(keep0, -1.0), jnp.int32(0))
    )
    keep_sorted = keep_sorted > 0.5
    # Scatter from visit order back to original positions.
    scatter = lambda o, k: jnp.zeros((n,), bool).at[o].set(k)
    for _ in range(order.ndim - 1):
        scatter = jax.vmap(scatter)
    return scatter(order, keep_sorted)


@partial(jax.jit, static_argnames=("offset",))
def nms_unsorted_fixpoint(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    thresh: jax.Array | float,
    offset: float = LEGACY_OFFSET,
    groups: jax.Array | None = None,
) -> jax.Array:
    """Sort-free greedy NMS — pure elementwise + MXU matvec, no gathers.

    The visit order (score desc, index asc) never needs materializing: the
    suppression adjacency uses the PRECEDENCE relation directly,
    ``j ≻ i ⇔ s_j > s_i ∨ (s_j = s_i ∧ j < i)``, so
    ``M[i, j] = IoU(i, j) > τ ∧ j ≻ i ∧ valid_j`` and the greedy keep set is
    the unique fixpoint of ``keep = valid ∧ ¬(M·keep > 0)`` (Jacobi converges
    in suppression-chain depth). Eliminates the argsort + take_along_axis +
    scatter that dominate the sorted formulations on TPU. Exact keep-set
    parity with the oracle.

    With ``groups`` (an (..., N) int array), suppression additionally requires
    ``groups[i] == groups[j]`` — the single fixpoint then solves every group's
    independent NMS problem at once on the block-diagonal adjacency (one
    (N, N) IoU for all groups). Exactly equals running per-group NMS on each
    group's subsequence: the precedence relation restricted to a group
    preserves that group's (score desc, index asc) visit order.

    boxes: (..., N, 4); scores/valid: (..., N) → keep (..., N) bool.
    """
    n = boxes.shape[-2]
    s = jnp.where(valid, scores, -jnp.inf)
    idx = jnp.arange(n)
    prec = (s[..., None, :] > s[..., :, None]) | (
        (s[..., None, :] == s[..., :, None]) & (idx[None, :] < idx[:, None])
    )  # prec[i, j] ⇔ j visits before i
    iou = pairwise_iou(boxes, boxes, offset=offset)
    m = (iou > thresh) & prec & valid[..., None, :]
    if groups is not None:
        m = m & (groups[..., None, :] == groups[..., :, None])
    m = m.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        suppressed = (
            jnp.einsum("...ij,...j->...i", m, keep, preferred_element_type=jnp.float32)
            > 0.5
        )
        return valid_f * (1.0 - suppressed.astype(jnp.float32)), keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid_f, jnp.full_like(valid_f, -1.0), jnp.int32(0))
    )
    return keep > 0.5


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

    Typical use: per-frame per-class NMS over a (T, C, N) snippet. On TPU
    with a static threshold this dispatches to the Pallas packed-fixpoint
    kernel (kernels/nms_pallas.py — adjacency stays in VMEM); elsewhere the
    sort-free XLA fixpoint runs. The choice is made per LOWERING platform
    (``lax.platform_dependent``), not per process-default backend, so
    CPU-placed computations on a TPU host (and AOT lowerings for another
    platform) get the right path. All paths share the oracle's exact keep
    set; nms_xla remains for callers that need the ranked visit order.
    """
    n = scores.shape[-1]
    if n <= 128 and not isinstance(thresh, jax.core.Tracer):
        from vdetlib_tpu.kernels.nms_pallas import batched_nms_pallas

        return jax.lax.platform_dependent(
            boxes,
            scores,
            valid,
            tpu=lambda b, s, v: batched_nms_pallas(
                b, s, v, float(thresh), offset=offset
            ),
            default=lambda b, s, v: nms_unsorted_fixpoint(
                b, s, v, thresh, offset=offset
            ),
        )
    return nms_unsorted_fixpoint(boxes, scores, valid, thresh, offset=offset)


def nms_grouped(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    groups: jax.Array,
    thresh: jax.Array | float,
    offset: float = LEGACY_OFFSET,
) -> jax.Array:
    """Greedy NMS of disjoint group sub-problems sharing one slot axis.

    Equivalent to per-group :func:`batched_nms` (e.g. per-class NMS when each
    detection slot carries exactly ONE class, as in the fused pipeline's
    slot-packed det set) but with a single (N, N) IoU matrix and one fixpoint
    for all groups — ~G× cheaper than broadcasting the boxes per group. On
    TPU with a static threshold the Pallas in-VMEM fixpoint kernel runs
    (selected per lowering platform — see :func:`batched_nms`).
    """
    n = scores.shape[-1]
    if n <= 512 and not isinstance(thresh, jax.core.Tracer):
        from vdetlib_tpu.kernels.nms_pallas import nms_pallas_grouped

        lead = scores.shape[:-1]

        def pallas_path(b, s, v, g):
            return nms_pallas_grouped(
                b.reshape((-1, n, 4)),
                s.reshape((-1, n)),
                v.reshape((-1, n)),
                g.reshape((-1, n)),
                float(thresh),
                offset=offset,
            ).reshape(lead + (n,))

        return jax.lax.platform_dependent(
            boxes,
            scores,
            valid,
            groups,
            tpu=pallas_path,
            default=lambda b, s, v, g: nms_unsorted_fixpoint(
                b, s, v, thresh, offset=offset, groups=g
            ),
        )
    return nms_unsorted_fixpoint(
        boxes, scores, valid, thresh, offset=offset, groups=groups
    )


def nms_host(dets, thresh: float, offset: float = LEGACY_OFFSET) -> list[int]:
    """Host-side NMS on dets[N, 5] → ranked keep indices (original numbering).

    Dispatches to the native C++ kernel when built (vdetlib_tpu/native), else
    a vectorized numpy fallback with identical semantics. This is the pure-CPU
    path used by config 1 (BASELINE.json:7) where no device is involved.
    """
    from vdetlib_tpu.native import nms as native_nms

    return native_nms(dets, thresh, offset)
