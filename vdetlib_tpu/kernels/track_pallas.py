"""Pallas TPU kernel for the folded fwd+bwd tracker scan — EXPERIMENTAL.

STATUS (round 2, measured): hardware-correct (interpret/XLA parity test
below the wrapper; alive decisions bit-equal on hardware) but 1.8× SLOWER
than the XLA ``lax.scan`` it targets (35.5 vs 19.8 ms at T=256, A=8) — NOT
dispatched by default (opt in via ``VDETLIB_TPU_TRACK_PALLAS=1``). The XLA
scan is launch-overhead-bound (~77µs/step for ~3µs of FLOPs), but Mosaic's
constraints push the replacement cost above that budget: the ROI-align
w-contraction cannot be a matmul view (splitting a minor dim by reshape is
an unsupported shape cast), so it runs as a VPU fori loop whose per-
iteration overhead (~1µs even ×8 hand-unrolled) exceeds the per-step launch
cost the kernel exists to remove. Full unrolling is no escape: Mosaic's
scoped-VMEM stack allocator keeps every unrolled temporary live (16 MB
limit, measured 35–103 MB). See RESULTS.md round 2 for the experiment log.

Reference parity: the per-frame FCN-tracker loop (``vdetlib/vid/track.py::
fcn_tracker``, SURVEY.md §3.2) — one NCC search step per frame per anchor,
box_t depending on box_{t-1}.

Design: the WHOLE scan is one kernel — the grid axis is the frame axis (TPU
grid steps execute sequentially), the carried tracker state (per-lane box +
alive) lives in VMEM scratch across grid steps, and each step advances the
forward lanes at frame i and the backward lanes at frame T-1-i — the same
2A-lane fold as track_batch. Mosaic pipelines the per-frame feature blocks
HBM→VMEM automatically (two views of the same feats array with different
index maps).

Per-step math (must mirror nn/tracker_net.py::ncc_update at num_scales=1):
- search window = box scaled by ``search_factor`` about its center;
- ROI-align of the window to (Q, Q, C): stage 1 (contract h) is ONE shared
  (A·Q, h) × (h, w·C) bf16 matmul (MXU) — the feature map is shared by all
  lanes; stage 2 (contract w) is per-lane bilinear weights applied as Q
  masked reduces (VPU) — inputs quantized to bf16, accumulation f32, exactly
  the XLA roi_align's dtype contract;
- NCC: template dot at each of R² positions (unrolled static slices) over a
  patch-L2 norm (P² shift-adds of the squared pooled map);
- soft-argmax (temperature 50) → sub-bin displacement; peak → confidence;
- self-gated alive/box update (identical gating to track_batch's step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _track_kernel(
    anchor_ts_ref, anchor_boxes_ref, tmpl_ref, feat_f_ref, feat_b_ref,
    fbox_ref, fconf_ref, falive_ref, bbox_ref, bconf_ref, balive_ref,
    box_s, alive_s, u_s, wxe_s, pooled_s,
    *, T, h, w, C, Q, P, factor, stride, conf_thresh, temperature,
):
    i = pl.program_id(0)
    A = anchor_boxes_ref.shape[0]
    R = Q - P + 1

    @pl.when(i == 0)
    def _init():
        box_s[:] = jnp.zeros_like(box_s)
        alive_s[:] = jnp.zeros_like(alive_s)

    anchor_ts = anchor_ts_ref[:]  # (A, 1) int32
    anchor_boxes = anchor_boxes_ref[:]  # (A, 4) f32

    outs = (
        (0, i, feat_f_ref, fbox_ref, fconf_ref, falive_ref),
        (1, T - 1 - i, feat_b_ref, bbox_ref, bconf_ref, balive_ref),
    )
    for d, t_d, feat_ref, obox, oconf, oalive in outs:
        feat2 = feat_ref[0]  # (h, w*C) bf16
        # ALL gating state is kept as 2D (A, 1) float 0/1 masks — Mosaic has
        # no lowering for several 1D (A,) i1-vector ops (reshape, i8→i1
        # trunc), so booleans never materialize at vector rank 1 here.
        started_m = jnp.where(anchor_ts == t_d, 1.0, 0.0)  # (A, 1) f32
        carry_box = box_s[d]  # (A, 4)
        alive_old = alive_s[d]  # (A, 1) f32 0/1
        box = anchor_boxes * started_m + carry_box * (1.0 - started_m)
        alive2 = jnp.maximum(alive_old, started_m)  # (A, 1)

        # ---- search window (ncc_update: search_window(box, factor)) ----
        x1c, y1c = box[:, 0:1], box[:, 1:2]
        x2c, y2c = box[:, 2:3], box[:, 3:4]
        cx = 0.5 * (x1c + x2c)
        cy = 0.5 * (y1c + y2c)
        bw = (x2c - x1c) * factor
        bh = (y2c - y1c) * factor
        wx1 = cx - 0.5 * bw
        wy1 = cy - 0.5 * bh
        wx2 = cx + 0.5 * bw
        wy2 = cy + 0.5 * bh

        # ---- ROI align stage 1: contract h with ONE shared matmul ----
        # All weight matrices are built DIRECTLY at (A·Q, ·) granularity via
        # iota arithmetic — Mosaic cannot split a minor dim by reshape (the
        # (A·Q, w·C) → (A, Q, w, C) view is an unsupported shape cast), so
        # the lane-expansion (A,) → (A·Q,) rides a tiny one-hot matmul and
        # every later step uses static slices only.
        L = A * Q
        lane_of = jax.lax.broadcasted_iota(jnp.int32, (L, A), 0) // Q
        er = (
            lane_of == jax.lax.broadcasted_iota(jnp.int32, (L, A), 1)
        ).astype(jnp.float32)  # (L, A) one-hot row → lane

        def rep(v):  # (A, 1) per-lane scalar column → (L, 1) per-row
            # mult+reduce, not an (L,A)×(A,1) matmul — N=1/K=8 MXU shapes
            # are degenerate and risk miscompiles
            return jnp.sum(er * v.T, axis=1, keepdims=True)

        qy_col = (
            jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % Q
        ).astype(jnp.float32)
        # vertical bilinear rows at (L, h): pos depends on (lane, qy)
        y1r = rep(wy1 / stride)
        biny = rep((wy2 - wy1) / (stride * Q))
        posy = jnp.clip(y1r + (qy_col + 0.5) * biny - 0.5, 0.0, h - 1.0)
        gridh = jax.lax.broadcasted_iota(jnp.int32, (L, h), 1).astype(jnp.float32)
        wy2d = jnp.maximum(0.0, 1.0 - jnp.abs(posy - gridh)).astype(
            jnp.bfloat16
        )  # (L, h)

        # ---- stage 2: contract w (per-row weights, VPU fori loop) ----
        # A fori_loop (not an unrolled Python loop) keeps ONE accumulator
        # live — the unrolled form stacked 80 (L, Q, C) temporaries and blew
        # the 16 MB scoped-VMEM stack. Dynamic lane-dim slices must be
        # 128-aligned (C is padded to 128 by the wrapper); the wi axis of the
        # weights sits on the UNTILED leading dim where dynamic indexing is
        # unrestricted.
        qs = jax.lax.broadcasted_iota(jnp.int32, (L, Q), 1).astype(jnp.float32)
        x1r = rep(wx1 / stride)
        binx = rep((wx2 - wx1) / (stride * Q))
        posx = jnp.clip(x1r + (qs + 0.5) * binx - 0.5, 0.0, w - 1.0)  # (L, Q)
        gridw = jax.lax.broadcasted_iota(jnp.int32, (w, L, Q), 0).astype(
            jnp.float32
        )
        wxe = jnp.maximum(0.0, 1.0 - jnp.abs(posx[None, :, :] - gridw))
        # Dynamic slicing is only lowered through REFS (not values) — stash
        # the stage-2 operands in VMEM scratch and index the refs in the loop.
        wxe_s[:] = wxe.astype(jnp.bfloat16)  # (w, L, Q)
        # stage-1 matmul in two w-halves: Mosaic matmul accumulators must be
        # 32-bit, and one full (L, w·C) f32 intermediate alone blows the
        # 16 MB scoped-VMEM stack; each half is rounded to bf16 (the XLA
        # path's dot-then-astype, same values) as it lands in scratch.
        half = (w // 2) * C
        for s0, s1 in ((0, half), (half, w * C)):
            u_s[:, s0:s1] = jax.lax.dot_general(
                wy2d, feat2[:, s0:s1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        # hand-unrolled ×UB: in-kernel fori iterations carry ~1µs of
        # loop/address overhead each (Mosaic fori supports only unroll=1 or
        # full, and the fully-unrolled form OOMed scoped VMEM — 8 live
        # temporaries per outer step is the sweet spot)
        UB = next(u for u in (8, 4, 2, 1) if w % u == 0)

        def bstep(wo, acc):
            for k in range(UB):
                wi = wo * UB + k
                u_wi = u_s[:, pl.ds(wi * C, C)].astype(jnp.float32)  # (L, C)
                wcol = wxe_s[wi].astype(jnp.float32)  # (L, Q)
                acc = acc + wcol[:, :, None] * u_wi[:, None, :]
            return acc

        pooled3 = jax.lax.fori_loop(
            0, w // UB, bstep, jnp.zeros((L, Q, C), jnp.float32)
        )
        # the XLA roi_align returns features.dtype (bf16) — quantize to match
        pooled3 = pooled3.astype(jnp.bfloat16).astype(jnp.float32)
        # regroup rows (l·Q+qy) → (A, Qy, Qx, C) directly into scratch:
        # leading-dim static row slices are layout-legal
        for l in range(A):
            pooled_s[l] = pooled3[l * Q : (l + 1) * Q]

        # ---- NCC (tracker_net.correlate): template dot / patch L2 norm ----
        # fori over p (dynamic ref index on the untiled Qy axis), q unrolled
        # (static sublane slices) — bounds live temporaries to one p-row.
        def cstep(p, carry):
            norm3, resp3 = carry
            prow = pooled_s[:, pl.ds(p, R)]  # (A, R, Q, C)
            trow = tmpl_ref[:, pl.ds(p, 1)]  # (A, 1, P, C)
            sprow = jnp.sum(prow * prow, axis=3)  # (A, R, Q)
            for q in range(P):
                norm3 = norm3 + sprow[:, :, q : q + R]
                tpq = trow[:, 0, q]  # (A, C) static slice
                resp3 = resp3 + jnp.sum(
                    prow[:, :, q : q + R, :] * tpq[:, None, None, :], axis=3
                )
            return norm3, resp3

        zero3 = jnp.zeros((A, R, R), jnp.float32)
        norm3, resp3 = jax.lax.fori_loop(0, P, cstep, (zero3, zero3))
        ncc = resp3 / jnp.sqrt(norm3 + 1e-6)  # (A, R, R)

        # ---- soft-argmax (tracker_net.soft_argmax_2d), (A, 1) columns ----
        peak = jnp.max(jnp.max(ncc, axis=2), axis=1, keepdims=True)  # (A, 1)
        wgt = jnp.exp(temperature * (ncc - peak[:, :, None]))
        den = jnp.sum(jnp.sum(wgt, axis=2), axis=1, keepdims=True)  # (A, 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (A, R, R), 1).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.int32, (A, R, R), 2).astype(jnp.float32)
        py = jnp.sum(jnp.sum(wgt * ys, axis=2), axis=1, keepdims=True) / den
        px = jnp.sum(jnp.sum(wgt * xs, axis=2), axis=1, keepdims=True) / den
        dx = (px - (R - 1) / 2.0) * (bw / Q)  # (A, 1)
        dy = (py - (R - 1) / 2.0) * (bh / Q)
        cand = box + jnp.concatenate([dx, dy, dx, dy], axis=1)  # (A, 4)

        # ---- self-gated update (track_batch step semantics), f32 masks ----
        track_now = alive2 * (1.0 - started_m)  # (A, 1) ∈ {0, 1}
        ok = jnp.where(peak > conf_thresh, 1.0, 0.0)  # (A, 1)
        new_alive = alive2 * (1.0 - track_now * (1.0 - ok))
        upd = track_now * ok
        new_box = cand * upd + box * (1.0 - upd)
        conf_out = started_m + (1.0 - started_m) * peak  # (A, 1)

        obox[0] = new_box
        # conf/alive outputs are (1, 1, A) blocks — store the transposed col
        oconf[0] = conf_out.T
        oalive[0] = new_alive.T  # emit == new_alive (started ⇒ alive)
        box_s[d] = new_box
        alive_s[d] = new_alive


@functools.partial(
    jax.jit,
    static_argnames=("Q", "P", "factor", "stride", "conf_thresh", "interpret"),
)
def track_scan_pallas(
    feats,  # (T, h, w, C) tracker features (any float dtype; used as bf16)
    anchor_ts,  # (A,) int32
    anchor_boxes,  # (A, 4) f32
    templates,  # (A, P, P, C) f32 L2-normalized
    Q: int,
    P: int,
    factor: float,
    stride: int = 4,
    conf_thresh: float = 0.5,
    interpret: bool = False,
):
    """Folded fwd+bwd tracker scan as one Pallas program.

    Returns (fb, fc, fa, bb, bc, ba): forward/backward boxes (T, A, 4), conf
    (T, A) and alive (T, A) — already indexed by FRAME (the backward lane's
    step writes its row directly), so callers select per-frame direction with
    ``use_f = t >= anchor_t`` exactly as track_batch does.
    """
    T, h, w, C0 = feats.shape
    A = anchor_ts.shape[0]
    # pad channels to a lane multiple: the kernel's stage-2 loop dynamic-
    # slices the (L, w·C) pooled rows at wi·C offsets, and Mosaic requires
    # dynamic lane-dim offsets to be 128-aligned. Zero channels change no
    # dot product or norm.
    C = ((C0 + 127) // 128) * 128
    if C != C0:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, 0), (0, C - C0)))
        templates = jnp.pad(
            templates, ((0, 0), (0, 0), (0, 0), (0, C - C0))
        )
    feats2 = feats.astype(jnp.bfloat16).reshape(T, h, w * C)

    kernel = functools.partial(
        _track_kernel,
        T=T, h=h, w=w, C=C, Q=Q, P=P,
        factor=float(factor), stride=stride,
        conf_thresh=float(conf_thresh), temperature=50.0,
    )
    full = lambda *shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    spec_f = pl.BlockSpec((1, h, w * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(
        (1, h, w * C), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    # conf/alive outputs are (T, 1, A): Mosaic requires the last two block
    # dims to divide (8, 128) or equal the array dims — (1, A) of a (T, A)
    # array fails the sublane rule, (1, 1, A) of (T, 1, A) passes.
    out_f = pl.BlockSpec((1, A, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_fv = pl.BlockSpec((1, 1, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_b = pl.BlockSpec(
        (1, A, 4), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    out_bv = pl.BlockSpec(
        (1, 1, A), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )

    fb, fc, fa, bb, bc, ba = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            full(A, 1),
            full(A, 4),
            full(A, P, P, C),
            spec_f,
            spec_b,
        ],
        out_specs=(out_f, out_fv, out_fv, out_b, out_bv, out_bv),
        out_shape=(
            jax.ShapeDtypeStruct((T, A, 4), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, A), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, A), jnp.float32),
            jax.ShapeDtypeStruct((T, A, 4), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, A), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, A), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, A, 4), jnp.float32),
            pltpu.VMEM((2, A, 1), jnp.float32),
            pltpu.VMEM((A * Q, w * C), jnp.bfloat16),  # stage-2 input rows
            pltpu.VMEM((w, A * Q, Q), jnp.bfloat16),  # expanded Wx weights
            pltpu.VMEM((A, Q, Q, C), jnp.float32),  # pooled search windows
        ],
        interpret=interpret,
    )(
        anchor_ts.astype(jnp.int32).reshape(A, 1),
        anchor_boxes.astype(jnp.float32),
        templates.astype(jnp.float32),
        feats2,
        feats2,
    )
    fc, fa, bc, ba = (v[:, 0] for v in (fc, fa, bc, ba))
    return fb, fc, fa > 0.5, bb, bc, ba > 0.5
