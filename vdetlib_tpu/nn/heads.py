"""ROI align + Fast R-CNN head (class scores + per-class bbox deltas).

Reference parity: the Caffe R-CNN scoring head behind
``vdetlib/vid/detect.py::det_vid`` — per-proposal class scores and (dx, dy,
dw, dh) regression deltas (SURVEY.md §3.1).

TPU design: ROI align is expressed as two *separable bilinear matmuls*
instead of gathers — for each ROI build interpolation matrices Wy (P, H) and
Wx (P, W) whose rows are the 1-D bilinear kernels at the bin centers, then
``pooled = einsum('ph,hwc,qw->pqc', Wy, F, Wx)``. Exact bilinear sampling
(sampling_ratio=1), but it runs on the MXU and vmaps cleanly over
(batch, rois) with zero dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_weights(starts, ends, size: int, pool: int):
    """1-D bilinear interpolation matrix for one ROI axis.

    Args:
      starts, ends: ROI extent in feature coordinates (scalars).
      size: feature-map extent (H or W).
      pool: output bins P.
    Returns:
      (P, size) weight matrix; row p sums to 1 (bilinear kernel at bin center).
    """
    bin_w = (ends - starts) / pool
    centers = starts + (jnp.arange(pool, dtype=jnp.float32) + 0.5) * bin_w  # (P,)
    # ROI-align convention: sample at center - 0.5 in pixel-center coords.
    pos = jnp.clip(centers - 0.5, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)  # (size,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))  # (P, size)
    return w


def roi_align(features, boxes, stride: int, pool: int = 7, compute_dtype=None):
    """ROI-align via separable bilinear matmuls.

    Args:
      features: (H, W, C) feature map (single image).
      boxes: (R, 4) pixel-space [x1, y1, x2, y2].
      stride: feature stride (image px per feature cell).
      pool: output spatial bins P.
      compute_dtype: matmul dtype; default float32. Pass ``jnp.bfloat16`` for
        MXU-rate pooling where ~3-digit interpolation is enough (the tracker's
        per-step NCC search pooling — the detector head stays f32).
    Returns:
      (R, P, P, C) pooled features, same dtype as ``features``.
    """
    H, W, C = features.shape
    cdt = jnp.float32 if compute_dtype is None else compute_dtype
    feats_c = features.astype(cdt)

    def one(box):
        x1, y1, x2, y2 = box / stride
        wy = _bilinear_weights(y1, y2, H, pool).astype(cdt)  # (P, H)
        wx = _bilinear_weights(x1, x2, W, pool).astype(cdt)  # (P, W)
        pooled = jnp.einsum(
            "ph,hwc->pwc", wy, feats_c, preferred_element_type=jnp.float32
        )
        pooled = jnp.einsum(
            "qw,pwc->pqc", wx, pooled.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return pooled.astype(features.dtype)

    return jax.vmap(one)(boxes.astype(jnp.float32))


class RCNNHead(nn.Module):
    """Pooled ROI features → (class scores, per-class bbox deltas)."""

    num_classes: int  # including background at index 0
    hidden: int = 1024
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (..., P, P, C) → scores (..., K), deltas (..., K, 4)."""
        x = roi_feats.astype(self.dtype)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        scores = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(
            x.astype(jnp.float32)
        )
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32, name="bbox")(
            x.astype(jnp.float32)
        )
        deltas = deltas.reshape(deltas.shape[:-1] + (self.num_classes, 4))
        return scores, deltas
