"""Dense optical flow — pyramidal block-matching, device-resident.

Reference parity: ``cv2.calcOpticalFlowFarneback`` (OpenCV C++), used by
motion-guided propagation (SURVEY.md §3.3). MGP only consumes the MEAN flow
inside each detection box, so the acceptance criterion is box-shift tolerance,
not flow-field equality (SURVEY.md §7 hard parts).

TPU design: classic coarse-to-fine block matching, expressed entirely as
shift + multiply + windowed-sum ops (VPU-friendly, no gathers in the cost
volume):
- grayscale pyramid via 2× average pooling;
- at each level, for every displacement (u, v) in a (2d+1)² window, the SSD
  cost map is a box-filtered squared difference of the shifted image; the
  soft-argmin over displacements is accumulated online (no cost volume);
- levels compose by upsampling the coarse flow and warping (bilinear).
All frame pairs of a snippet are processed as one batch (vmap over T-1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# ILP-vs-compile-time knob for the shift loop: 64 keeps the TPU's VPU busy
# (bench-validated); tests set this lower — unrolled XLA compiles are the
# dominant cost of the CPU suite.
_FLOW_UNROLL = int(os.environ.get("VDETLIB_TPU_FLOW_UNROLL", "64"))


def to_gray(frames_u8):
    """(..., H, W, 3) BGR uint8 → (..., H, W) float32 luma."""
    f = frames_u8.astype(jnp.float32)
    # BGR weights (Rec.601: 0.114 B, 0.587 G, 0.299 R)
    return f[..., 0] * 0.114 + f[..., 1] * 0.587 + f[..., 2] * 0.299


# native pyramid pooling per preset: 1 = full res, 2 = half, 4 = quarter
FLOW_PRESET_POOL = {"accurate": 1, "fast": 2, "fastest": 4}


def flow_coord_scale(preset: str) -> float:
    """Box-coordinate scale onto the preset's native (no-upsample) flow grid."""
    return 1.0 / FLOW_PRESET_POOL[preset]


def _avg_pool2(x):
    """2x2 mean-pool of (..., H, W)."""
    s = x.shape
    x = x[..., : s[-2] // 2 * 2, : s[-1] // 2 * 2]
    x = x.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
    return x.mean(axis=(-3, -1))


def _box_mean(x, radius: int):
    """Windowed mean of (..., H, W) with a (2r+1)² box, same-size output.

    Separable: two 1-D reduce_windows (2·(2r+1) adds/pixel instead of
    (2r+1)² — 3.5× fewer ops at r=3)."""
    k = 2 * radius + 1
    win = jax.lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 1) + (k,),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )
    win = jax.lax.reduce_window(
        win,
        jnp.zeros((), x.dtype),
        jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (k, 1),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )
    return win / (k * k)


def _pad_edge(img, pad: int):
    """Edge-replicate pad of the trailing (H, W) dims (do once, slice many)."""
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge")


# TPU note: shifts are dynamic slices of a pre-padded image — data movement
# the compiler folds into the consumer. The earlier fancy-indexing version
# lowered to two gathers per shift and dominated the whole flow stage; the
# earlier fully-unrolled static-slice version blew up compile time (and, with
# a stacked cost volume, memory) at large search windows.


def _warp_bilinear(img, flow):
    """Warp (..., H, W) by (..., H, W, 2) flow (sample img at x+flow)."""
    H, W = img.shape[-2:]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + flow[..., 1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + flow[..., 0]
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = ys - y0
    wx = xs - x0

    def gather(yy, xx):
        return img[..., yy, xx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _flow_level(i1, i2, search: int, radius: int, temperature: float):
    """Single-level block-matching flow i1→i2 for (H, W) images.

    Returns (H, W, 2) flow (dx, dy), sub-pixel via soft-argmin over the
    (2*search+1)² SSD cost volume.

    Memory note: the soft-argmin is accumulated ONLINE over the shift set in
    one pass (flash-softmax-style running min with accumulator rescaling)
    instead of stacking an (S, H, W) cost volume — the stacked form
    materialized with a pathological singleton-dim layout under vmap (128×
    padding → OOM at search=5 with many frame pairs), and a fully unrolled
    form blew up compile time. Temps stay O(H·W); unroll=32 restores ILP.
    """
    H, W = i1.shape[-2:]
    S = 2 * search + 1
    i2_pad = _pad_edge(i2, search)

    def body(i, carry):
        m, den, fx, fy = carry
        dy = i // S - search
        dx = i % S - search
        shifted = jax.lax.dynamic_slice(
            i2_pad, (search + dy, search + dx), (H, W)
        )
        diff = i1 - shifted
        c = _box_mean(diff * diff, radius).astype(jnp.float32)
        # online soft-argmin (flash-softmax style): rescale accumulators
        # when a new per-pixel minimum appears
        m_new = jnp.minimum(m, c)
        rescale = jnp.exp(-temperature * (m - m_new))
        w = jnp.exp(-temperature * (c - m_new))
        den = den * rescale + w
        fx = fx * rescale + w * dx.astype(jnp.float32)
        fy = fy * rescale + w * dy.astype(jnp.float32)
        return m_new, den, fx, fy

    init = (
        jnp.full((H, W), jnp.inf, jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
    )
    # partial unroll: enough ILP for the VPU to stay busy, bounded compile
    _, den, fx, fy = jax.lax.fori_loop(0, S * S, body, init, unroll=min(_FLOW_UNROLL, S * S))
    return jnp.stack([fx / den, fy / den], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("levels", "search", "radius", "temperature")
)
def flow_pair(
    g1,
    g2,
    levels: int = 3,
    search: int = 3,
    radius: int = 3,
    temperature: float = 0.08,
):
    """Coarse-to-fine flow between two grayscale images (H, W) → (H, W, 2)."""
    pyr1, pyr2 = [g1], [g2]
    for _ in range(levels - 1):
        pyr1.append(_avg_pool2(pyr1[-1]))
        pyr2.append(_avg_pool2(pyr2[-1]))
    flow = None
    for lvl in reversed(range(levels)):
        i1, i2 = pyr1[lvl], pyr2[lvl]
        if flow is None:
            flow = _flow_level(i1, i2, search, radius, temperature)
        else:
            # upsample previous flow (×2) and refine residually
            up = jax.image.resize(flow * 2.0, i1.shape + (2,), method="bilinear")
            i2w = _warp_bilinear(i2, up)
            res = _flow_level(i1, i2w, search, radius, temperature)
            flow = up + res
    return flow


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "search", "radius", "temperature", "preset", "upsample",
    ),
)
def flow_video(
    frames_u8,
    levels: int = 3,
    search: int = 3,
    radius: int = 3,
    temperature: float = 0.08,
    preset: str = "accurate",
    upsample: bool = True,
):
    """Flow for all consecutive pairs of (T, H, W, 3) frames → (T-1, H, W, 2).

    flow[t] maps frame t → t+1 (forward flow).

    ``preset="fast"`` trades resolution for throughput: the pyramid starts at
    half resolution (4× less finest-level work), uses a smaller search window,
    and runs the cost volume in bfloat16 (2× VPU width). Box-mean shifts (the
    only thing MGP consumes) stay within ~1px of the accurate preset; the
    returned field is upsampled back to full resolution.
    """
    gray = to_gray(frames_u8)
    if preset in ("fast", "fastest"):
        # Single reduced-res level with a wide search window: the cost volume
        # is nearly free on the VPU (static slices + separable box sums),
        # while the pyramid's upsample+warp refinement was gather/resize-bound
        # and dominated the stage. "fast" = half res (±5 half-px ≈ ±10 full-px
        # motion coverage); "fastest" = quarter res (±20 full-px coverage,
        # 4× less finest-level work again — box-MEAN shifts stay accurate
        # because MGP averages the coarser field over ≥16px boxes).
        # On TPU the level runs as a Pallas kernel that keeps each pair's
        # whole S² online soft-argmin in VMEM (kernels/flow_pallas.py) —
        # the XLA form streams (T-1, H, W) temporaries through HBM every
        # shift iteration and is HBM-bound.
        pool = FLOW_PRESET_POOL[preset]
        gray_h = _avg_pool2(gray)
        if pool == 4:
            gray_h = _avg_pool2(gray_h)
        gray_h = gray_h.astype(jnp.bfloat16)
        from vdetlib_tpu.kernels.flow_pallas import flow_level_pallas

        # per LOWERING platform (not process default backend), so CPU-placed
        # computations on a TPU host avoid the TPU-only pallas_call
        f = jax.lax.platform_dependent(
            gray_h[:-1],
            gray_h[1:],
            tpu=lambda a, b: flow_level_pallas(
                a, b, search=5, radius=radius, temperature=temperature
            ),
            default=lambda a, b: jax.vmap(
                lambda x, y: _flow_level(x, y, 5, radius, temperature)
            )(a, b),
        )
        # reduced-res displacements → full-res px
        f = f.astype(jnp.float32) * float(pool)
        if not upsample:
            # (T-1, H/pool, W/pool, 2) grid, values in FULL-res pixels —
            # consumers sample it with 1/pool-scale coordinates
            # (boxes * flow_coord_scale(preset)).
            return f
        full = frames_u8.shape[1:3]
        return jax.image.resize(f, (f.shape[0], *full, 2), method="bilinear")
    f = jax.vmap(
        lambda a, b: flow_pair(
            a, b, levels=levels, search=search, radius=radius, temperature=temperature
        )
    )(gray[:-1], gray[1:])
    return f


def mean_flow_in_boxes(flow, boxes, valid):
    """Mean flow vector inside each box (the MGP shift).

    Args:
      flow: (H, W, 2); boxes: (N, 4) pixel [x1,y1,x2,y2]; valid: (N,) bool.
    Returns:
      (N, 2) mean (dx, dy) per box (zeros for invalid/degenerate boxes).

    Uses a 2-D integral image so every box costs O(1) — one program for any
    number of boxes, no data-dependent shapes.
    """
    H, W = flow.shape[:2]
    ii = jnp.cumsum(jnp.cumsum(flow, axis=0), axis=1)  # (H, W, 2)
    ii = jnp.pad(ii, ((1, 0), (1, 0), (0, 0)))

    x1 = jnp.clip(jnp.floor(boxes[:, 0]).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(jnp.floor(boxes[:, 1]).astype(jnp.int32), 0, H - 1)
    x2 = jnp.clip(jnp.ceil(boxes[:, 2]).astype(jnp.int32) + 1, x1 + 1, W)
    y2 = jnp.clip(jnp.ceil(boxes[:, 3]).astype(jnp.int32) + 1, y1 + 1, H)
    total = ii[y2, x2] - ii[y1, x2] - ii[y2, x1] + ii[y1, x1]  # (N, 2)
    area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32)[:, None]
    mean = total / jnp.maximum(area, 1.0)
    return jnp.where(valid[:, None], mean, 0.0)
