"""Assembled detector: backbone + ROI head, batched over (frames, proposals).

The compute core of the detection stage (reference:
``vdetlib/vid/detect.py::det_vid`` + the external Caffe net; SURVEY.md §3.1).
One jitted apply processes a whole frame batch with its padded proposal sets —
the reference's two nested Python hot loops collapse into this single program.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from vdetlib_tpu.nn.backbone import Backbone, BackboneConfig
from vdetlib_tpu.nn.heads import RCNNHead, roi_align


@dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = 31  # ImageNet VID: 30 classes + background
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    roi_pool: int = 7
    head_hidden: int = 1024
    # Preprocessing constants (reference Caffe convention: BGR, mean subtract).
    pixel_mean: tuple = (102.98, 115.95, 122.77)  # BGR
    pixel_scale: float = 1.0


class Detector(nn.Module):
    config: DetectorConfig = field(default_factory=DetectorConfig)

    def setup(self):
        self.backbone = Backbone(self.config.backbone)
        self.head = RCNNHead(
            num_classes=self.config.num_classes,
            hidden=self.config.head_hidden,
        )

    def __call__(self, images, rois, train: bool = False):
        """Full forward.

        Args:
          images: (B, H, W, 3) float32, already preprocessed (BGR, mean-sub).
          rois: (B, R, 4) pixel-space proposal boxes (padded).
        Returns:
          scores: (B, R, K) float32 class logits (K includes background 0).
          deltas: (B, R, K, 4) float32 per-class box regression deltas.
        """
        feats = self.backbone(images, train=train)  # (B, H/16, W/16, C)
        pooled = jax.vmap(
            lambda f, b: roi_align(f, b, stride=16, pool=self.config.roi_pool)
        )(feats, rois)  # (B, R, P, P, C)
        scores, deltas = self.head(pooled)
        return scores, deltas

    def features(self, images, train: bool = False):
        return self.backbone(images, train=train)


def preprocess_images(images_u8, config: DetectorConfig):
    """uint8 BGR (B, H, W, 3) → float32, mean-subtracted.

    Kept separate so the uint8 array is what crosses PCIe (4x less HBM
    traffic); XLA fuses the cast+subtract into the first conv's input.
    """
    mean = jnp.asarray(config.pixel_mean, dtype=jnp.float32)
    return (images_u8.astype(jnp.float32) - mean) * config.pixel_scale


def init_detector(config: DetectorConfig, image_shape, max_rois: int, seed: int = 0):
    """Initialize parameters for a static (H, W) image shape."""
    model = Detector(config)
    H, W = image_shape
    rng = jax.random.PRNGKey(seed)
    # jit the init: eager flax init dispatches each op separately (≈100s on
    # CPU for this net); compiled it's one program.
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.zeros((1, max_rois, 4), jnp.float32),
    )
    return model, variables
