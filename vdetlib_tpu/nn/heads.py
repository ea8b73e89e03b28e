"""ROI align + Fast R-CNN head (class scores + per-class bbox deltas).

Reference parity: the Caffe R-CNN scoring head behind
``vdetlib/vid/detect.py::det_vid`` — per-proposal class scores and (dx, dy,
dw, dh) regression deltas (SURVEY.md §3.1).

TPU design: ROI align is expressed as bilinear *matmuls* instead of gathers
— per ROI ``pooled = einsum('ph,hwc,qw->pqc', Wy, F, Wx)`` where Wy (P, H) /
Wx (P, W) hold the 1-D bilinear kernels at the bin centers. Exact bilinear
sampling (sampling_ratio=1), vmaps cleanly over (batch, rois), zero dynamic
shapes.

Measured negative (round 3, drift-cancelled A/B on the chip — RESULTS.md):
a "fused" layout building the full W2 (R·P², H·W) = Wy ⊗ Wx interpolation
matrix and doing ONE (R·P², H·W) @ (H·W, C) matmul looks like a better MXU
tile on paper (M≈3k, K≈300 vs per-ROI 7×15 einsums) but measures 1.8×
SLOWER (11.7 vs 6.4 ms marginal at the bench shape): the W2 materialization
(~120 MB/step at B=32) is pure HBM traffic, and XLA already batches the
separable einsums well. Kept selectable via ``fused=True`` for the record.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_weights(starts, ends, size: int, pool: int):
    """1-D bilinear interpolation matrix for one ROI axis.

    Args:
      starts, ends: ROI extent in feature coordinates (scalars or (R,)).
      size: feature-map extent (H or W).
      pool: output bins P.
    Returns:
      (..., P, size) weight matrix; each row sums to 1 (bilinear kernel at
      the bin center).
    """
    starts = jnp.asarray(starts, jnp.float32)
    ends = jnp.asarray(ends, jnp.float32)
    bin_w = (ends - starts) / pool  # (...)
    centers = (
        starts[..., None]
        + (jnp.arange(pool, dtype=jnp.float32) + 0.5) * bin_w[..., None]
    )  # (..., P)
    # ROI-align convention: sample at center - 0.5 in pixel-center coords.
    pos = jnp.clip(centers - 0.5, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)  # (size,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., :, None] - grid))  # (..., P, size)
    return w


def roi_align(
    features, boxes, stride: int, pool: int = 7, compute_dtype=None,
    fused: bool = False,
):
    """ROI-align via separable bilinear matmuls (module docstring has layouts).

    Args:
      features: (H, W, C) feature map (single image).
      boxes: (R, 4) pixel-space [x1, y1, x2, y2].
      stride: feature stride (image px per feature cell).
      pool: output spatial bins P.
      compute_dtype: matmul dtype; default float32. Pass ``jnp.bfloat16`` for
        MXU-rate pooling where ~3-digit interpolation is enough (the tracker's
        per-step NCC search pooling — the detector head stays f32).
      fused: use the one-big-matmul W2 layout instead — measured 1.8× slower
        at the detector shape (see module docstring); kept for the A/B probe.
        Both are exact bilinear sampling, differing only in float summation
        order.
    Returns:
      (R, P, P, C) pooled features, same dtype as ``features``.
    """
    H, W, C = features.shape
    cdt = jnp.float32 if compute_dtype is None else compute_dtype
    b = boxes.astype(jnp.float32) / stride

    if fused:
        R = boxes.shape[0]
        wy = _bilinear_weights(b[:, 1], b[:, 3], H, pool)  # (R, P, H)
        wx = _bilinear_weights(b[:, 0], b[:, 2], W, pool)  # (R, P, W)
        w2 = wy[:, :, None, :, None] * wx[:, None, :, None, :]  # (R,P,P,H,W)
        w2 = w2.reshape(R * pool * pool, H * W).astype(cdt)
        pooled = jnp.matmul(
            w2, features.reshape(H * W, C).astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return pooled.reshape(R, pool, pool, C).astype(features.dtype)

    feats_c = features.astype(cdt)

    def one(wy, wx):
        pooled = jnp.einsum(
            "ph,hwc->pwc", wy.astype(cdt), feats_c,
            preferred_element_type=jnp.float32,
        )
        pooled = jnp.einsum(
            "qw,pwc->pqc", wx.astype(cdt), pooled.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return pooled.astype(features.dtype)

    wy = _bilinear_weights(b[:, 1], b[:, 3], H, pool)  # (R, P, H)
    wx = _bilinear_weights(b[:, 0], b[:, 2], W, pool)  # (R, P, W)
    return jax.vmap(one)(wy, wx)


class _PooledDense(nn.Module):
    """First head layer as an einsum over the UNFLATTENED pooled tensor.

    ``reshape (..., P, P, C) -> (..., P²C)`` before a Dense forces a physical
    relayout on TPU — (P, C) = (7, 512) is a tile-unaligned minor block, so
    XLA rewrites the whole activation tensor before the MXU sees it. The
    einsum form contracts over (p, q, c) directly with the kernel viewed as
    (P, P, C, H): measured 0.88 -> 0.59 ms for the head segment at the bench
    shape (63% -> 93% of bf16 peak; scripts/probe_head.py, RESULTS.md round
    4 — a fused Pallas variant measured SLOWER, 1.03 ms, because it needs
    the same relayout as a (P², M, C) transpose on the way in).

    Param shapes/names match ``nn.Dense`` exactly ((P²C, H) kernel, (H,)
    bias, lecun_normal fan-in P²C), so checkpoints are interchangeable with
    the reshape+Dense formulation; outputs differ only by bf16 contraction
    order (<=0.5% — same class as a backend change).
    """

    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # x: (..., P, P, C)
        p, q, c = x.shape[-3:]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p * q * c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        kr = kernel.reshape(p, q, c, self.features).astype(self.dtype)
        y = jnp.einsum(
            "...pqc,pqch->...h", x.astype(self.dtype), kr,
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


class RCNNHead(nn.Module):
    """Pooled ROI features → (class scores, per-class bbox deltas)."""

    num_classes: int  # including background at index 0
    hidden: int = 1024
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (..., P, P, C) → scores (..., K), deltas (..., K, 4)."""
        x = roi_feats.astype(self.dtype)
        x = nn.relu(
            _PooledDense(self.hidden, dtype=self.dtype, name="Dense_0")(x)
        )
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="Dense_1")(x))
        scores = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(
            x.astype(jnp.float32)
        )
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32, name="bbox")(
            x.astype(jnp.float32)
        )
        deltas = deltas.reshape(deltas.shape[:-1] + (self.num_classes, 4))
        return scores, deltas
