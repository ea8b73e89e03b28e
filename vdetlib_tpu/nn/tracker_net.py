"""Correlation tracker network — the FCN-tracker equivalent.

Reference parity: ``vdetlib/vid/track.py::fcn_tracker`` ("Visual Tracking
with FCN", ICCV'15; SURVEY.md §2.2/§3.2): per step, correlate the anchor's
template against a search window around the previous box; the response peak
gives the new box, the peak value the confidence.

TPU design: one conv pass computes dense tracker features for ALL frames of a
snippet (shared by every anchor); template and search-window features are
ROI-aligned from that map (separable-matmul ROI align, MXU), and the
correlation is a vmapped valid-mode convolution. The per-frame sequential
structure lives in ``lax.scan`` (video/track.py), not here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from vdetlib_tpu.nn.backbone import _gn
from vdetlib_tpu.nn.heads import roi_align


@dataclass(frozen=True)
class TrackerConfig:
    features: tuple = (32, 64, 96)
    out_features: int = 96
    template_pool: int = 8  # template is P×P feature bins
    search_factor: float = 2.0  # search window side = factor × box side
    dtype: jnp.dtype = jnp.bfloat16
    # Scale adaptation (FCN-tracker style): correlate at num_scales box
    # scales per step, adopt the best peak's scale with damping. 1 = off.
    num_scales: int = 1
    scale_step: float = 1.05
    scale_damping: float = 0.5
    scale_penalty: float = 0.975  # multiplier on non-unity scale peaks
    # Template adaptation (appearance-drift remedy, classic correlation-
    # filter EMA): after each CONFIDENT step (peak > template_update_conf),
    # blend the carried template toward the features at the new box and
    # renormalize. 0.0 = off — frozen anchor template, the legacy behavior.
    # The confidence gate is what keeps the classic failure (template walks
    # onto an occluder/distractor) in check.
    template_eta: float = 0.0
    template_update_conf: float = 0.6

    @property
    def stride(self) -> int:
        # matches TrackerNet's conv strides (2 for the first two stages);
        # every ROI-align position derives from THIS, not a literal 4, so a
        # features-tuple change cannot silently shift the coordinate scale
        return 2 ** min(2, len(self.features))

    @property
    def search_pool(self) -> int:
        # same bin resolution over the larger window
        return int(round(self.template_pool * self.search_factor))


class TrackerNet(nn.Module):
    """Frames (B, H, W, 3) → dense features (B, H/4, W/4, C), stride 4."""

    config: TrackerConfig = field(default_factory=TrackerConfig)

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(cfg.dtype)
        for i, feats in enumerate(cfg.features):
            stride = 2 if i < 2 else 1
            x = nn.Conv(
                feats, (3, 3), strides=(stride, stride), padding="SAME",
                use_bias=False, dtype=cfg.dtype,
            )(x)
            x = _gn(feats, cfg.dtype)(x)
            x = nn.relu(x)
        x = nn.Conv(cfg.out_features, (1, 1), dtype=cfg.dtype)(x)
        return x

    @property
    def stride(self) -> int:
        return self.config.stride


def extract_template(feat, box, cfg: TrackerConfig):
    """Anchor-box template features: (P, P, C), L2-normalized."""
    pooled = roi_align(feat, box[None], stride=cfg.stride, pool=cfg.template_pool)[0]
    pooled = pooled.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(pooled * pooled) + 1e-6)
    return pooled / norm


def search_window(box, factor: float):
    """Box → centered window scaled by ``factor`` (same center)."""
    cx = 0.5 * (box[..., 0] + box[..., 2])
    cy = 0.5 * (box[..., 1] + box[..., 3])
    w = (box[..., 2] - box[..., 0]) * factor
    h = (box[..., 3] - box[..., 1]) * factor
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def correlate(template, search_feat):
    """Normalized cross-correlation of template over a search feature map.

    Args:
      template: (P, P, C) L2-normalized.
      search_feat: (Q, Q, C).
    Returns:
      (Q-P+1, Q-P+1) response in [-1, 1] (cosine similarity per position).
    """
    P = template.shape[0]
    s = search_feat.astype(jnp.float32)[None]  # (1, Q, Q, C)
    k = template[:, :, :, None]  # (P, P, C, 1) HWIO
    resp = jax.lax.conv_general_dilated(
        s, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0, :, :, 0]
    # local L2 norm of each search patch (conv of squares with ones kernel)
    ones = jnp.ones((P, P, s.shape[-1], 1), jnp.float32)
    sq = jax.lax.conv_general_dilated(
        s * s, ones, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0, :, :, 0]
    return resp / jnp.sqrt(sq + 1e-6)


def soft_argmax_2d(resp, temperature: float = 50.0):
    """Response map → (dy, dx) soft peak position (sub-bin) + peak value."""
    H, W = resp.shape
    w = jax.nn.softmax(temperature * resp.reshape(-1)).reshape(H, W)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    py = jnp.sum(w * ys)
    px = jnp.sum(w * xs)
    peak = jnp.max(resp)
    return py, px, peak
