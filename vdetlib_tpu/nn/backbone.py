"""Convolutional backbone — residual CNN, stride-16 feature map.

Design notes (TPU): convs are NHWC with channel counts in multiples of 128
where it matters (the deep stages), bfloat16 activations/weights with GroupNorm
(stateless — no running statistics to synchronize across data-parallel shards), no data-dependent control flow. The reference used
external Caffe GoogLeNet/VGG backbones; this is our own residual design — the
capability (dense features for proposal scoring) is what's preserved, not the
architecture.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _gn(features: int, dtype):
    """GroupNorm with groups dividing the channel count (32 when possible)."""
    import math

    return nn.GroupNorm(num_groups=math.gcd(32, features), dtype=dtype)


@dataclass(frozen=True)
class BackboneConfig:
    stem_features: int = 64
    stage_sizes: Sequence[int] = (2, 2, 2)  # blocks per stage (strides 4→8→16)
    stage_features: Sequence[int] = (128, 256, 512)
    dtype: jnp.dtype = jnp.bfloat16


class ResBlock(nn.Module):
    features: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        y = _gn(self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )(y)
        y = _gn(self.features, self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(residual)
            residual = _gn(self.features, self.dtype)(residual)
        return nn.relu(y + residual)


class Backbone(nn.Module):
    """Images (B, H, W, 3) float → features (B, H/16, W/16, C_out)."""

    config: BackboneConfig = field(default_factory=BackboneConfig)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = x.astype(cfg.dtype)
        x = nn.Conv(
            cfg.stem_features, (7, 7), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=cfg.dtype,
        )(x)
        x = _gn(cfg.stem_features, cfg.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # stride 4
        for si, (n_blocks, feats) in enumerate(zip(cfg.stage_sizes, cfg.stage_features)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = ResBlock(feats, stride, cfg.dtype)(x, train=train)
        return x

    @property
    def stride(self) -> int:
        return 16

    @property
    def out_features(self) -> int:
        return self.config.stage_features[-1]
